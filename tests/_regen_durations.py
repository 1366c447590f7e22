"""Rebuild tests/durations.json from a `pytest --durations=0` log.

Usage:
    pytest tests/ -q --durations=0 > /tmp/dur.log 2>&1
    python tests/_regen_durations.py /tmp/dur.log
"""
import json
import os
import re
import sys


def main(log_path):
    dur = {}
    for line in open(log_path):
        m = re.match(r"^([\d.]+)s call\s+(tests/\S+)", line)
        if m:
            dur[m.group(2)] = round(float(m.group(1)), 2)
    out = os.path.join(os.path.dirname(__file__), "durations.json")
    with open(out, "w") as f:
        json.dump(dict(sorted(dur.items(), key=lambda kv: -kv[1])), f, indent=0)
    print(f"{out}: {len(dur)} entries")


if __name__ == "__main__":
    main(sys.argv[1])
