"""The north rule ships the engine to executors via ``spark-submit
--py-files <zip>`` (README "Cluster deployment"). That only works if
every module is zipimport-clean: importable from a zip archive, in a
fresh interpreter, with NO active SparkSession — i.e. no module-level
Column/DataFrame expressions (pyspark raises without a session), no
``__file__``-relative data loading, no import-time JVM access.

This test builds the exact artifact the README documents (``zip -r
cfs.zip chainalytic_framework_spark``) and imports every submodule from
it in a subprocess whose cwd is elsewhere, so a regression in any
module's import-time behavior fails here instead of on a cluster.
"""

import pkgutil
import subprocess
import sys
import zipfile
from pathlib import Path

import chainalytic_framework_spark as cfs

REPO = Path(cfs.__file__).resolve().parent.parent


def _all_submodules() -> list[str]:
    names = ["chainalytic_framework_spark"]
    for mod in pkgutil.walk_packages(cfs.__path__, prefix="chainalytic_framework_spark."):
        names.append(mod.name)
    return names


def test_every_module_imports_from_pyfiles_zip(tmp_path):
    zip_path = tmp_path / "cfs.zip"
    pkg_root = REPO / "chainalytic_framework_spark"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg_root.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))

    mods = _all_submodules()
    assert len(mods) > 20  # the walk found the real tree, not a stub
    prog = (
        "import sys\n"
        f"sys.path.insert(0, {str(zip_path)!r})\n"
        f"mods = {mods!r}\n"
        "import importlib\n"
        "for m in mods:\n"
        "    mod = importlib.import_module(m)\n"
        "    assert mod.__file__.startswith(" + repr(str(zip_path)) + "), (m, mod.__file__)\n"
        "print('IMPORTED', len(mods))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=tmp_path,  # not the repo: nothing may resolve via cwd
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert f"IMPORTED {len(mods)}" in out.stdout
