"""The north rule's launch path, dynamically: spark-submit --py-files
ships the engine zip to a fresh JVM whose driver imports it only from
the zip (tests/test_pyfiles_zip.py is the static guard; this is the
live one)."""

from __future__ import annotations

import shutil
import subprocess
import sys

import pytest


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_smoke():
    proc = subprocess.run(
        [sys.executable, "tools/spark_submit_smoke.py"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert '"spark_submit_smoke": "ok"' in proc.stdout
