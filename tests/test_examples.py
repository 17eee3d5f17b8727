"""Example scripts run byte-for-byte against their golden outputs —
the same harness shape as the reference's tests/test_examples.py
(import the module, capture stdout, compare to examples/output/*.txt).
"""

from __future__ import annotations

import io
import pathlib
from contextlib import redirect_stdout
from importlib import import_module

import pytest

examples_dir = pathlib.Path(__file__).parent.parent / "examples"


def pytest_generate_tests(metafunc):
    argvalues, testids = [], []
    for pyfile in sorted(examples_dir.glob("*.py")):
        if pyfile.stem.startswith("_"):
            continue
        outfile = examples_dir / "output" / f"{pyfile.stem}.txt"
        argvalues.append((f"examples.{pyfile.stem}", outfile.read_text()))
        testids.append(pyfile.stem)
    metafunc.parametrize(("module_name", "module_output"), argvalues, ids=testids)


def test_example(spark, module_name, module_output):
    # `spark` fixture first: the example's get_spark() then reuses the
    # session instead of paying a second JVM start
    with redirect_stdout(io.StringIO()) as o:
        import_module(module_name)
    assert o.getvalue() == module_output
