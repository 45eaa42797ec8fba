"""Driver entry points must compile and execute on a virtual device mesh."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2,)


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip(n):
    import __graft_entry__ as g

    g.dryrun_multichip(n)
