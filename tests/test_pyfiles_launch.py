"""North-rule launch mode: the whole engine must run via
`spark-submit --py-files <pkg.zip>` with NO cwd dependence — the
package reaches driver and executors (the extract job's Arrow UDFs
import it worker-side) only through the zip."""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_end_to_end(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip()
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)

    def submit(*args):
        r = subprocess.run(
            ["spark-submit", "--master", "local[4]", "--py-files", zip_path,
             os.path.join(ROOT, "jobs", "run.py"), *args],
            capture_output=True, text=True, cwd=str(tmp_path), timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    g = submit("generate", "--n", "500", "--out", f"{tmp_path}/pages")
    assert g["n"] == 500
    e = submit("extract", "--pages", f"{tmp_path}/pages",
               "--out", f"{tmp_path}/graph")
    # seeded corpus: exact counts are reproducible anywhere
    assert (e["vertices"], e["edges"]) == (530, 3499)
    t = submit("triangles", "--graph", f"{tmp_path}/graph")
    assert t["triangles"] == 1737
