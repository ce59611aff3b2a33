#!/bin/sh
# One-command local CI: the same checks .github/workflows/tests.yml runs,
# degrading gracefully when optional tooling (ruff, mkdocs) is absent in
# the local image.
set -e
cd "$(dirname "$0")/.."

echo "== byte-compile (syntax gate) =="
python -m compileall -q tabcorr_tpu scripts tests bench.py __graft_entry__.py

if command -v ruff > /dev/null 2>&1; then
    echo "== ruff =="
    ruff check tabcorr_tpu/ scripts/ tests/ bench.py __graft_entry__.py
else
    echo "== ruff not installed; skipped (CI runs it) =="
fi

if command -v mkdocs > /dev/null 2>&1; then
    echo "== docs build =="
    mkdocs build --strict
else
    echo "== mkdocs not installed; skipped (CI runs it) =="
fi

echo "== fast test suite =="
python -m pytest tests/ -m "not slow" -q

echo "== slow suite (goldens + pipeline; fast on CPU via the native counter) =="
python -m pytest tests/ -m slow -q
echo "LOCAL CI GREEN"
