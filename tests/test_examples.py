"""The examples corpus stays runnable: syntax-check everything, execute
the cheap DSL walkthrough end-to-end (the heavier campaign examples are
covered functionally by the core/lazy tests)."""
import os
import py_compile
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def test_all_examples_compile():
    files = [f for f in os.listdir(EXAMPLES) if f.endswith(".py")]
    assert len(files) >= 8
    for f in files:
        py_compile.compile(os.path.join(EXAMPLES, f), doraise=True)


@pytest.mark.parametrize("name,expect", [
    ("stream_operations.py", "operations sha256"),
    ("client.py", "miniSEED round trip"),
])
def test_example_runs(name, expect):
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, name)], env=env,
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert expect in out.stdout