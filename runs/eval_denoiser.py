"""Evaluate the trained denoiser (round-2 entry point).

Thin wrapper over runs/eval_heldout.py, which reports mean PSNR gain per
input profile over the held-out scenes of the round-2 MC-direct dataset.
Kept under this name because it is the historical eval entry point
(VERDICT.md round-1 item 4 'Done' check).

Usage: python runs/eval_denoiser.py [checkpoint.npz] [--report OUT.md]
"""
import runpy
import sys

sys.argv[0] = "runs/eval_heldout.py"
runpy.run_path("/root/repo/runs/eval_heldout.py", run_name="__main__")
