"""One fps story, enforced (VERDICT r3 #8).

Rounds 1-3 each ended with two or three different headline fps numbers
in-tree (docs written before the last perf commit landed, stale
docstrings).  This check greps every "<N> fps/chip" claim in the docs
and `mergenet_tpu/serving.py`, asserts they all quote ONE number, and
asserts that number is within tolerance of the newest driver-measured
`BENCH_rNN.json` at the repo root.  Runs in the default suite via
tests/test_docs_numbers.py; also runnable directly:

    python scripts/check_docs_numbers.py
"""
import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# files allowed to quote the headline; historical per-round tables use
# the "fps (1 chip)" column wording, so only "fps/chip" is matched
CLAIM_FILES = ["docs/benchmarks.md", "docs/roadmap.md", "docs/decoder.md",
               "mergenet_tpu/serving.py", "README.md"]
CLAIM_RE = re.compile(r"(\d+(?:\.\d+)?)\s*fps(?:[ -]per[ -]|/)chip")

# benches drift a few percent run to run; the docs must quote the
# driver's number, not a luckier local re-measure
TOLERANCE = 0.10


def latest_bench(root=ROOT):
    # The NEWEST measurement wins, by file modification time — never let
    # a stale BENCH_LOCAL.json (a builder measurement taken mid-round,
    # legitimate only until the driver next runs) shadow a newer
    # driver-measured BENCH_rNN.json.  Round 4's drift went undetected
    # because this function preferred BENCH_LOCAL unconditionally; the
    # driver's end-of-round number is the record the docs must match.
    paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    local = os.path.join(root, "BENCH_LOCAL.json")
    if os.path.exists(local):
        paths.append(local)
    if not paths:
        return None, None
    # mtime ties (a fresh clone stamps every file with checkout time)
    # resolve to the driver file: BENCH_rNN is the canonical record
    newest = max(paths, key=lambda p: (os.path.getmtime(p),
                                       "BENCH_LOCAL" not in p,
                                       p))
    with open(newest) as f:
        d = json.load(f)
    # the driver wraps bench.py's JSON line under "parsed"
    return d.get("parsed", d), os.path.basename(newest)


def find_claims(root=ROOT):
    claims = []
    for rel in CLAIM_FILES:
        p = os.path.join(root, rel)
        if not os.path.exists(p):
            continue
        with open(p) as f:
            for i, line in enumerate(f, 1):
                for m in CLAIM_RE.finditer(line):
                    claims.append((rel, i, float(m.group(1))))
    return claims


def check(root=ROOT):
    """Returns a list of problem strings (empty = consistent)."""
    bench, bench_name = latest_bench(root)
    claims = find_claims(root)
    problems = []
    # the 3.75 fps/chip pro-rated target is a constant, not a claim
    measured = [c for c in claims if abs(c[2] - 3.75) > 1e-9]
    if not measured:
        problems.append("no '<N> fps/chip' headline found in the docs")
        return problems
    values = sorted({c[2] for c in measured})
    if len(values) > 1:
        problems.append(
            "conflicting fps/chip headlines in-tree: " + "; ".join(
                "%s:%d says %.4g" % c for c in measured))
    if bench is not None:
        v = float(bench["value"])
        for rel, line, val in measured:
            if abs(val - v) > TOLERANCE * v:
                problems.append(
                    "%s:%d claims %.4g fps/chip but %s measured %.4g "
                    "(>%d%% off)" % (rel, line, val, bench_name, v,
                                     TOLERANCE * 100))
    return problems


if __name__ == "__main__":
    probs = check()
    for p in probs:
        print("DRIFT:", p)
    if not probs:
        b, name = latest_bench()
        print("docs fps headline consistent with %s (%.4g fps/chip)"
              % (name, float(b["value"]) if b else float("nan")))
    raise SystemExit(1 if probs else 0)
