"""examples/quickstart.py must stay runnable — it is the documented tour of
the whole pipeline (train → momentum → encode → retrieve → read → export)."""

import importlib.util
import os


def test_quickstart_runs_end_to_end(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "quickstart", os.path.join(root, "examples", "quickstart.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    summary = mod.main(["--workdir", str(tmp_path)])
    assert summary["end2end_n"] == 8
    assert summary["answer_em"] is not None
    assert os.path.exists(summary["exported_pt"])
