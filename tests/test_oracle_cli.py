"""BASELINE config 1 — oracle decode through the real CLI: ground-truth
class/offset maps -> merge decode -> COCOeval must give AP = 1.0
(the reference README's "Oracle Example", egs/coco segment.py --mode
oracle)."""

import os
import subprocess
import sys

import pytest

from test_recipes import _env, tiny_dataset  # fixture + env  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COCO_EGS = os.path.join(REPO, "egs", "coco", "local")


def _run(script, *argv):
    cmd = [sys.executable, os.path.join(COCO_EGS, script)] + list(argv)
    r = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                       timeout=1200)
    if r.returncode != 0:
        raise AssertionError("{} failed:\nSTDOUT:{}\nSTDERR:{}".format(
            script, r.stdout[-3000:], r.stderr[-3000:]))
    return r.stdout


def test_oracle_cli_perfect_ap(tiny_dataset, tmp_path):
    root, ann = tiny_dataset
    exp = str(tmp_path)
    _run("segment.py", "--dir", exp, "--mode", "oracle",
         "--img", root, "--ann", ann, "--num-classes", "3",
         "--num-offsets", "10", "--scale", "1", "--decoder", "python")
    out = _run("evaluate.py", "--segment-dir",
               os.path.join(exp, "segment"), "--val-ann", ann)
    # AP line: "... IoU=0.50:0.95 | area=   all | maxDets=100 ] = 1.000"
    ap_line = [ln for ln in out.splitlines()
               if "IoU=0.50:0.95" in ln and "area=   all" in ln
               and "(AP)" in ln][0]
    ap = float(ap_line.split("=")[-1])
    assert ap == 1.0, ap_line
