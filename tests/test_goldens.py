"""Golden-image regression anchors (all six judging scenes).

The renderer is bitwise deterministic for a fixed key on the CPU path
(counter-based RNG, no data-dependent reductions), so these assert
EXACT array equality against the committed goldens.  A failure means
the rendered energy / orientation / texture phase changed — regenerate
with tools/gen_goldens.py only for an intended behavioral change.
"""

import numpy as np
import pytest

from golden_utils import GOLDEN_CONFIGS, golden_path, render_golden


@pytest.mark.parametrize("name", sorted(GOLDEN_CONFIGS))
def test_golden_image(name):
    want = np.load(golden_path(name))
    got = render_golden(name)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_goldens_have_signal():
    """Sanity: goldens are not black/flat (a broken renderer that
    produced zeros everywhere would otherwise 'pass' forever)."""
    for name in GOLDEN_CONFIGS:
        img = np.load(golden_path(name))
        assert img.mean() > 0.05, name
        assert img.std() > 0.01, name
