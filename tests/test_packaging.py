"""Installable-packaging smoke checks (pyproject.toml).

The reference runs via requirements.txt + PYTHONPATH (reference
requirements.txt, run.sh); this package must `pip install -e .` and expose
console entry points.  The install itself is exercised out-of-band (CI /
round logs); here we verify the installed metadata resolves — and skip
cleanly in a bare PYTHONPATH checkout.
"""

import importlib.metadata as md

import pytest

try:
    _DIST = md.distribution("hoisdf-tpu")
except md.PackageNotFoundError:
    _DIST = None

needs_install = pytest.mark.skipif(
    _DIST is None, reason="hoisdf-tpu not pip-installed in this environment"
)


@needs_install
def test_console_entry_points_resolve():
    eps = {
        e.name: e for e in md.entry_points(group="console_scripts")
        if e.name.startswith("hoisdf-")
    }
    assert set(eps) == {"hoisdf-train", "hoisdf-eval", "hoisdf-bench"}
    for ep in eps.values():
        assert callable(ep.load()), ep.name


@needs_install
def test_version_matches_package():
    import hoisdf_tpu

    assert _DIST.version == hoisdf_tpu.__version__


def test_native_sources_ship_as_package_data():
    """native/build.py compiles src/*.cc at first use; the sources must be
    importable as package data so installed copies can build."""
    from importlib.resources import files

    src = files("hoisdf_tpu.native").joinpath("src", "pipeline.cc")
    assert src.is_file()
