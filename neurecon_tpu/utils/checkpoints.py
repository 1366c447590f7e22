"""Checkpoint IO for param/optimizer pytrees.

Mirrors the reference CheckpointIO contract (utils/checkpoints.py):
  * save(filename, global_step, epoch_idx) -> pickled numpy-ified pytrees
  * load_file(path, ignore_keys, only_use_keys) with key filtering (:59-102)
  * auto-resume from the newest checkpoint when path is None (:69-78)
  * sorted_ckpts ordering: numbered < latest < final (:139-159)

Pytrees are converted to host numpy for serialization and restored as jnp
arrays on load. Key filters match against top-level param-dict keys and
dotted paths.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.utils.console import log


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_device(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


def sorted_ckpts(ckpt_dir: str) -> List[str]:
    """All checkpoints ordered oldest -> newest-priority: numbered ascending,
    then latest, then final_*."""
    if not os.path.isdir(ckpt_dir):
        return []
    numbered, latest, final = [], None, None
    for fname in sorted(os.listdir(ckpt_dir)):
        if not (fname.endswith(".pt") or fname.endswith(".ckpt")):
            continue
        base = fname.rsplit(".", 1)[0]
        if base == "latest":
            latest = fname
        elif base.startswith("final_"):
            final = fname
        elif base.isdigit():
            numbered.append(fname)
    out = [os.path.join(ckpt_dir, f) for f in numbered]
    if latest:
        out.append(os.path.join(ckpt_dir, latest))
    if final:
        out.append(os.path.join(ckpt_dir, final))
    return out


def _filter_keys(d: dict, ignore_keys=None, only_use_keys=None) -> dict:
    ignore_keys = ignore_keys or []
    if only_use_keys is not None and not isinstance(only_use_keys, (list, tuple)):
        only_use_keys = [only_use_keys]

    def keep(k):
        if only_use_keys is not None:
            return k in only_use_keys
        return k not in ignore_keys

    out = {k: v for k, v in d.items() if keep(k)}
    for k in d:
        if k not in out:
            log.info(f"CheckpointIO: ignoring key '{k}'")
    return out


class CheckpointIO:
    def __init__(self, checkpoint_dir: str = "./ckpts", allow_mkdir: bool = True):
        self.checkpoint_dir = checkpoint_dir
        if allow_mkdir:
            os.makedirs(checkpoint_dir, exist_ok=True)
        self._modules = {}

    def register_modules(self, **kwargs):
        """Register named pytrees-by-reference via getter/setter pairs is not
        possible in a functional world; instead register a dict of CURRENT
        pytrees right before save, or use save(state=...)."""
        self._modules.update(kwargs)
        return self._modules

    def save(self, filename: str, global_step: int = 0, epoch_idx: int = 0,
             **pytrees):
        outdict = {"global_step": int(global_step), "epoch_idx": int(epoch_idx)}
        trees = dict(self._modules)
        trees.update(pytrees)
        for k, v in trees.items():
            outdict[k] = _to_numpy(v)
        path = os.path.join(self.checkpoint_dir, filename)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(outdict, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)  # atomic: a crash never corrupts `latest`
        log.info(f"CheckpointIO: saved {path}")
        return path

    def load_file(self, filename: Optional[str] = None,
                  ignore_keys=None, only_use_keys=None) -> dict:
        """filename None -> newest checkpoint in the dir (auto-resume);
        URL -> downloaded to <ckpt_dir>/_zoo once and cached (the reference
        routes URLs through torch model_zoo, checkpoints.py:104-114);
        returns {} when nothing exists."""
        if filename is None:
            ckpts = sorted_ckpts(self.checkpoint_dir)
            if not ckpts:
                log.info("CheckpointIO: no checkpoint found, starting fresh")
                return {}
            path = self._newest_by_step(ckpts)
        elif "://" in filename:
            path = self._fetch_url(filename)
        else:
            path = filename if os.path.isabs(filename) or os.path.exists(filename) \
                else os.path.join(self.checkpoint_dir, filename)
        with open(path, "rb") as f:
            data = pickle.load(f)
        log.info(f"CheckpointIO: loaded {path} (step {data.get('global_step')})")
        return self._postprocess(data, ignore_keys, only_use_keys)

    def _newest_by_step(self, ckpts: List[str]) -> str:
        """Auto-resume target: the candidate with the highest global_step.

        The reference's ordering (numbered < latest < final) assumes `latest`
        is always newest, but after a crash between a numbered backup and the
        next periodic save the backup can be AHEAD of `latest` (observed:
        latest at step 92300 vs backup 00100000 after a mid-run kill) —
        resuming from `latest` then silently redoes thousands of steps. Only
        the tail candidates can hold the max (numbered are ascending), so at
        most three pickles are inspected."""
        tail = ckpts[-3:]
        best, best_step = tail[-1], -1
        for path in tail:
            try:
                with open(path, "rb") as f:
                    step = int(pickle.load(f).get("global_step", 0))
            except Exception as e:  # truncated file from a crash mid-save
                log.warning(f"CheckpointIO: skipping unreadable {path}: {e}")
                continue
            if step >= best_step:  # ties keep reference order (later wins)
                best, best_step = path, step
        return best

    def _fetch_url(self, url: str) -> str:
        """Download-once cache for checkpoint URLs (file:// works offline).

        Keyed by a hash of the FULL url (two urls ending in 'latest.pt' must
        not collide) and downloaded to a temp name + os.replace so an
        interrupted transfer can never be mistaken for a cached checkpoint."""
        import hashlib
        from urllib.parse import urlparse
        from urllib.request import urlretrieve
        cache_dir = os.path.join(self.checkpoint_dir, "_zoo")
        os.makedirs(cache_dir, exist_ok=True)
        digest = hashlib.sha1(url.encode()).hexdigest()[:12]
        name = os.path.basename(urlparse(url).path) or "ckpt.pt"
        path = os.path.join(cache_dir, f"{digest}_{name}")
        if not os.path.exists(path):
            log.info(f"CheckpointIO: downloading {url}")
            # unique temp per process: two concurrent fetchers of the same URL
            # must not interleave writes or delete each other's partial file
            import tempfile
            fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".part")
            os.close(fd)
            try:
                urlretrieve(url, tmp)
                os.replace(tmp, path)
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
        return path

    def _postprocess(self, data, ignore_keys, only_use_keys):
        if "model" in data and (ignore_keys or only_use_keys):
            data["model"] = _filter_keys(data["model"], ignore_keys, only_use_keys)
        return {k: _to_device(v) if isinstance(v, (dict, list)) else v
                for k, v in data.items()}
