"""Multi-chip serving dry run as a pytest: 8 virtual devices, REAL tidigits
audio, dp x mp mesh with the senone axis of the acoustic model sharded over
mp (SURVEY.md §2.10 P1/P5).  Asserts sharded == single-device decode and
golden hypotheses — the driver's dryrun_multichip, under test."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multichip_8dev(reference_root):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (see conftest)")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)  # raises on any mismatch


def test_dryrun_multichip_2dev(reference_root):
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)
