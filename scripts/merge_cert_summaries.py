#!/usr/bin/env python3
"""Merge per-seed certification summaries into one summary.json.

`make_certification_fixtures.py` can run its seeds concurrently as
separate processes (one `--seeds N --fixtures 0` run per seed, each
with its own --out); this stitches the resulting per-seed summary.json
files back into the single multi-seed file the in-suite gates read
(tests/test_certification_512.py::test_summary_multiseed_gate).

Usage:
    python scripts/merge_cert_summaries.py OUT BASE_SUMMARY EXTRA...

OUT is the merged file to write; BASE_SUMMARY contributes the config
(its `seeds` list is rewritten to the union); EXTRA are further
summary.json files whose seed entries are merged in.  A seed present
twice must agree (the later file wins, with a warning).
"""
import json
import sys


def main():
    out, base, extras = sys.argv[1], sys.argv[2], sys.argv[3:]
    with open(base) as f:
        merged = json.load(f)
    for path in extras:
        with open(path) as f:
            s = json.load(f)
        for k in ("num_classes", "val_images", "epochs", "data_seed",
                  "height", "width"):
            assert s["config"][k] == merged["config"][k], (
                path, k, s["config"][k], merged["config"][k])
        assert s["offsets"] == merged["offsets"], path
        for seed, entry in s["seeds"].items():
            if seed in merged["seeds"]:
                print("warning: seed %s in both %s and %s; keeping %s"
                      % (seed, base, path, path))
            merged["seeds"][seed] = entry
    merged["config"]["seeds"] = sorted(int(k) for k in merged["seeds"])
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote %s with seeds %s" % (out, merged["config"]["seeds"]))


if __name__ == "__main__":
    main()
