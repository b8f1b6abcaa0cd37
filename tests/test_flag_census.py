"""Every accepted flag must either drive behavior or be on the documented
inert list (VERDICT round-1 item 7: no silently-dead flags).

The inert list is flags the REFERENCE also parses without consuming
(open_clip heritage) plus GPU-era distribution knobs that map onto the JAX
mesh runtime — each documented in config.py.
"""

import dataclasses
import pathlib
import re

from keds_tpu.config import Config

REPO = pathlib.Path(__file__).resolve().parent.parent

# Flags with no code path by design, with the reference-side justification:
DOCUMENTED_INERT = {
    # GPU/NCCL-era distribution knobs; the JAX mesh runtime replaces them
    # (config.py "distribution" section; --distributed/--dist-url are live
    # via parallel/mesh.py).
    "dist_backend", "gpu", "dp", "multigpu", "use_bn_sync",
    # inert in the reference too (parsed, never consumed by live code):
    "use_debiased_sampler", "use_prefix",            # src/params.py only
    "imagenet_val", "imagenet_v2",                   # loaders built, never read
    "zeroshot_frequency", "regression_frequency", "C",  # open_clip eval heritage
    # internal derived fields, not user flags:
    "rank",
}


def _used_field_names() -> set:
    pat = re.compile(r"(?:cfg|config|args|self)\.([a-z_][a-z_0-9]*)")
    used = set()
    for path in list((REPO / "keds_tpu").rglob("*.py")) + [
        REPO / "bench.py", REPO / "__graft_entry__.py"
    ]:
        used.update(pat.findall(path.read_text()))
    return used


def test_no_silently_dead_flags():
    used = _used_field_names()
    dead = {
        f.name
        for f in dataclasses.fields(Config)
        if f.name not in used
    }
    undocumented = dead - DOCUMENTED_INERT
    assert not undocumented, (
        f"flags parsed but driving no behavior and not on the documented "
        f"inert list: {sorted(undocumented)}"
    )
    # and the documented list must not rot: everything on it really is unread
    stale = {n for n in DOCUMENTED_INERT - {"rank"} if n in used}
    assert not stale, f"documented-inert flags now have code paths: {sorted(stale)}"
