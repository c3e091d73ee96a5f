"""The examples/ PyFlink 1.11 program must run unchanged through the
pyflink import shim (the migration story's executable proof)."""

import runpy
import sys


def test_pyflink_program_runs_unchanged(spark, capsys):
    for m in [k for k in sys.modules if k.startswith("pyflink")]:
        del sys.modules[m]
    import flink_1_11_1_spark.pyflink_shim as shim

    shim.install(force=True)
    runpy.run_path("examples/pyflink_1_11_program.py", run_name="__main__")
    assert "ran unchanged: OK" in capsys.readouterr().out


def test_shim_refuses_to_shadow_real_pyflink(monkeypatch):
    import importlib.util

    import flink_1_11_1_spark.pyflink_shim as shim

    real = type(sys)("pyflink")  # no shim marker -> "real"
    monkeypatch.setitem(sys.modules, "pyflink", real)
    try:
        shim.install()
        raised = False
    except RuntimeError:
        raised = True
    assert raised
