"""CLI-level metric parity vs the reference's own test.py.

Runs BOTH full eval stacks -- /root/reference/test.py (its datasets,
transforms, unpack, forward, losses, metrics, writers; torchvision via
scripts/tv_shim) and our eval CLI -- over the same synthetic GTA-SfM
tree with the same pretrained checkpoint, then gates on the metric
deltas. This is the documented reference protocol end to end
(/root/reference/test.py:318-409, README.md:72-87), not just a forward
pass at pretrained weights. Small size keeps the torch-CPU side
tractable; scripts/parity_eval_cli.py runs the same comparison at the
full 480x640 eval size (results recorded in docs/PARITY.md).
"""

import json
import os
import subprocess
import sys

import pytest

from tests.conftest import reference_available

REPO = os.path.join(os.path.dirname(__file__), "..")
SCRIPT = os.path.join(REPO, "scripts", "parity_eval_cli.py")


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="needs /root/reference")
@pytest.mark.parametrize("dataset,extra,samples", [
    ("gta", ["--frames", "4"], 6),           # 2 seqs x 3 lines, layered
    ("demon", ["--sequences", "1", "--frames", "3"], 6),  # mvs+sun3d scenes
])
def test_eval_cli_parity_small(tmp_path, dataset, extra, samples):
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--dataset", dataset, "--size", "240", "320",
         "--work", str(tmp_path / "work")] + extra,
        text=True, timeout=3000,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    lines = [l for l in proc.stdout.splitlines()
             if l.startswith("PARITY_CLI ")]
    assert proc.returncode == 0 and lines, proc.stdout[-4000:]
    result = json.loads(lines[0][len("PARITY_CLI "):])
    assert result["ok"], result
    assert result["samples"] == samples, result
    assert abs(result["delta_abs_rel"]) < 2e-3, result
    assert abs(result["delta_a1"]) < 2e-3, result
