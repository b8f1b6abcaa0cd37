"""Every CLI must print usable --help (argparse wiring smoke test)."""

import pytest


@pytest.mark.parametrize("mod", [
    "keds_tpu.cli.main", "keds_tpu.cli.eval_retrieval", "keds_tpu.cli.demo",
    "keds_tpu.cli.serve",
    "keds_tpu.tools.extract_features", "keds_tpu.tools.build_database",
    "keds_tpu.tools.extract_nouns",
])
def test_cli_help(mod, capsys):
    import importlib

    m = importlib.import_module(mod)
    with pytest.raises(SystemExit) as e:
        m.main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "usage" in out.lower()
