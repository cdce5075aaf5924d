"""(Re)generate the committed golden-image anchors (tests/goldens/).

Run on the CPU backend so goldens match the test environment exactly:

    python tools/gen_goldens.py [scene ...]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from golden_utils import GOLDEN_CONFIGS, GOLDEN_DIR, golden_path, render_golden


def main():
    names = sys.argv[1:] or list(GOLDEN_CONFIGS)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names:
        img = render_golden(name)
        np.save(golden_path(name), img)
        print(f"{name}: {img.shape} mean={img.mean():.6f} -> {golden_path(name)}")


if __name__ == "__main__":
    main()
