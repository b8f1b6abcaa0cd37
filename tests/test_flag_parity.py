"""CLI flag-surface parity: every option the reference argparse defines
(src/params.py) must be accepted by our parser."""

import sys

import pytest


def test_all_reference_flags_accepted(reference_src):
    sys.path.insert(0, str(reference_src))
    try:
        import params as ref_params
    finally:
        sys.path.pop(0)
    import argparse

    # introspect the reference parser without running it
    ref_parser = argparse.ArgumentParser()
    real_parse = argparse.ArgumentParser.parse_args
    captured = {}

    def fake_parse(self, *a, **k):
        captured["parser"] = self
        raise SystemExit(0)

    argparse.ArgumentParser.parse_args = fake_parse
    old_argv = sys.argv
    sys.argv = ["prog"]
    try:
        with pytest.raises(SystemExit):
            ref_params.parse_args()
    finally:
        argparse.ArgumentParser.parse_args = real_parse
        sys.argv = old_argv
    ref_opts = set()
    for action in captured["parser"]._actions:
        for opt in action.option_strings:
            if opt.startswith("--"):
                ref_opts.add(opt)

    from keds_tpu.config import parse_args as our_parse

    # build our parser the same way
    import keds_tpu.config as cfgmod

    our_parser = argparse.ArgumentParser()
    cfgmod._add_flags(our_parser)
    our_opts = {o for a in our_parser._actions for o in a.option_strings
                if o.startswith("--")}

    missing = sorted(ref_opts - our_opts)
    # documented intentional omissions only
    allowed_missing = {"--help"} if "--help" in missing else set()
    missing = [m for m in missing if m not in allowed_missing]
    assert not missing, f"reference flags not accepted: {missing}"
