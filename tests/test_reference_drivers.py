"""Drop-in compatibility: the REFERENCE's own benchmark driver scripts (unmodified,
executed straight from /root/reference) must run against this package.

This is the north-star requirement — the pybind11-era surface preserved so the
reference's tests/ scripts work as-is.  (They cannot run against the reference's own
build: its module has unresolved symbols and this image lacks Eigen/pybind11.)
"""

import os
import runpy
import sys

import pytest

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _run_driver(script: str, argv, monkeypatch, capsys):
    import matplotlib

    matplotlib.use("Agg")
    monkeypatch.setattr(sys, "argv", [os.path.basename(script)] + list(argv))
    ns = runpy.run_path(script, run_name="__main__")
    out = capsys.readouterr().out
    return ns, out


def test_reference_iaea2d_driver_runs_unmodified(monkeypatch, capsys):
    ns, out = _run_driver(f"{REF}/iaea2d/iaea2d.py", ["--mesh", "1x1"], monkeypatch,
                          capsys)
    assert "CONVERGENCE ATTEINTE" in out
    # the driver computed and printed a pcm deviation vs its hard-coded k_ref;
    # at 1x1 mesh the discrete eigenvalue sits ~-90 pcm from the reference value
    import re

    m = re.search(r"k-eff direct\s*=\s*([0-9.]+)", out)
    assert m, out
    keff = float(m.group(1))
    assert abs(keff - 1.028631) < 5e-4


def test_reference_zion2d_driver_runs_unmodified(monkeypatch, capsys):
    import re

    ns, out = _run_driver(f"{REF}/zion2d/zion2d.py", [], monkeypatch, capsys)
    m = re.search(r"k-eff direct\s*=\s*([0-9.]+)", out)
    assert m, out[-2000:]
    # pinned eigenvalue at the driver's default mesh + explicit-baffle geometry
    # (converges hard: dk = 0 at 19 outers on CPU float64)
    assert abs(float(m.group(1)) - 1.279729) < 2e-4


@pytest.mark.parametrize("script,argv,k_expected", [
    ("biblis2d/biblis2D.py", ["--mesh", "2x2"], 1.025690),
    ("koeberg2d/koeberg2d.py", ["--mesh", "1x1"], 1.010796),
    ("iaea3d/iaea3d.py", ["--mesh", "1x1"], 1.027866),
])
def test_other_reference_drivers_run_unmodified(script, argv, k_expected,
                                                monkeypatch, capsys):
    """BIBLIS / KOEBERG (4-group) / IAEA-3D reference scripts, straight from the
    reference tree, produce our pinned eigenvalues (driver tolerances are loose:
    set_tol(1e-5, 1e-4, ...) with coarse init, hence the wide k window)."""
    import re

    ns, out = _run_driver(f"{REF}/{script}", argv, monkeypatch, capsys)
    m = re.search(r"k-eff direct\s*=\s*([0-9.]+)", out)
    assert m, out[-2000:]
    assert abs(float(m.group(1)) - k_expected) < 5e-4
