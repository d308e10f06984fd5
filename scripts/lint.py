#!/usr/bin/env python
"""Lint gate: `ruff check` when the binary exists, syntax gate always.

This container ships no ruff (and package installs are disallowed), so
the gate probes for it — the pyproject.toml config is live the moment
the environment upgrades. Until then the script still compiles every
source file (a real, always-available syntax/undefined-future gate) so
`python scripts/lint.py` is never a silent no-op.

Exit codes: 0 clean (or ruff absent and compile clean), 1 findings.
"""

from __future__ import annotations

import compileall
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGETS = [
    "parquet_modular_encryption_spark",
    "tests",
    "scripts",
    "bench.py",
    "__spark_entry__.py",
]


def main() -> int:
    ok = True
    for target in TARGETS:
        path = os.path.join(REPO, target)
        if path.endswith(".py"):
            ok &= bool(compileall.compile_file(path, quiet=2))
        else:
            ok &= bool(compileall.compile_dir(path, quiet=2))
    if not ok:
        print("lint: FAIL (syntax)")
        return 1

    ruff = shutil.which("ruff")
    if ruff is None:
        print("lint: syntax OK; ruff=MISSING (config in pyproject.toml is "
              "live on env upgrade)")
        return 0
    proc = subprocess.run(
        [ruff, "check", *TARGETS], cwd=REPO, check=False
    )
    print(f"lint: syntax OK; ruff rc={proc.returncode}")
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
