def get_data(args, return_val: bool = False, val_downscale: float = 4.0):
    """Dataset dispatch on args.data.type (ref dataio/__init__.py:1-27).

    Defaults to DTU; 'synthetic' is an addition of this framework: an analytic
    sphere scene requiring no files on disk (used by tests and benchmarks).
    """
    dataset_type = args.data.get("type", "DTU")
    cfgs = {
        "scale_radius": args.data.get("scale_radius", -1),
        "data_dir": args.data.get("data_dir", None),
        "downscale": args.data.downscale,
    }

    if dataset_type == "DTU":
        from neurecon_tpu.dataio.dtu import SceneDataset
        cfgs["cam_file"] = args.data.get("cam_file", None)
    elif dataset_type in ("BlendedMVS", "blended_mvs"):
        from neurecon_tpu.dataio.blendedmvs import SceneDataset
    elif dataset_type == "custom":
        from neurecon_tpu.dataio.custom import SceneDataset
    elif dataset_type == "synthetic":
        from neurecon_tpu.dataio.synthetic import SceneDataset
        cfgs["n_images"] = args.data.get("n_images", 16)
        cfgs["H"] = args.data.get("H", 120)
        cfgs["W"] = args.data.get("W", 160)
        cfgs["shape"] = args.data.get("shape", "sphere")
        cfgs["background"] = args.data.get("background", "black")
    else:
        raise NotImplementedError(dataset_type)

    dataset = SceneDataset(**cfgs)
    if return_val:
        cfgs["downscale"] = val_downscale
        val_dataset = SceneDataset(**cfgs)
        return dataset, val_dataset
    return dataset
