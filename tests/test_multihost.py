"""Two-process jax.distributed smoke test (VERDICT round-1 item 8).

Exercises the explicit --distributed bring-up (parallel/mesh.py:
maybe_init_distributed with --dist-url + RANK/WORLD_SIZE, the reference's
torch-style launch env) on the CPU backend: both processes join, build a
global mesh, and run one psum collective across hosts.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from keds_tpu.config import Config
from keds_tpu.parallel.mesh import make_mesh, maybe_init_distributed

cfg = Config(distributed=True, dist_url=os.environ["TEST_DIST_URL"])
maybe_init_distributed(cfg)
# the CLIs call this from both setup_experiment and setup_runtime — the
# second call must be a no-op, not a crash (jax raises 'should only be
# called once' on repeat initialize)
maybe_init_distributed(cfg)
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()  # all global devices
n = mesh.devices.size
assert n == 4, n  # 2 local devices x 2 processes

# one cross-host collective: global sum of a data-sharded array
x = jax.make_array_from_callback(
    (n,), NamedSharding(mesh, P("data")),
    lambda idx: jnp.asarray([float(idx[0].start)]),
)
total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(x)
expect = sum(range(n))
got = float(jax.device_get(total))
assert got == expect, (got, expect)
print(f"rank {jax.process_index()}: psum over {n} devices OK ({got})")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_psum():
    port = _free_port()
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["TEST_DIST_URL"] = f"tcp://127.0.0.1:{port}"
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["WORLD_SIZE"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO_ROOT),
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-2000:]}"
        assert "psum over 4 devices OK" in out, out


CHILD_E2E = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from keds_tpu.config import Config
from keds_tpu.parallel.mesh import (
    local_mesh_size, make_mesh, maybe_init_distributed, shard_batch,
    fetch_global,
)

cfg = Config(distributed=True, dist_url=os.environ["TEST_DIST_URL"])
maybe_init_distributed(cfg)
assert jax.process_count() == 2

import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.retrieval.database import KnowledgeDB, Retriever
from keds_tpu.train.losses import TrainBatch
from keds_tpu.train.trainer import make_train_step

D = 32
ccfg = mclip.ClipConfig(
    embed_dim=D, image_resolution=32, vision_layers=1, vision_width=64,
    vision_patch_size=16, transformer_width=D, transformer_heads=1,
    transformer_layers=1,
)
params = mclip.init_clip(jax.random.key(0), ccfg)
k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
heads = FusionHeads(
    img2text=mheads.init_im2text(k1, D, 24, D),
    retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=2),
    text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=2),
)
rng_np = np.random.default_rng(0)
db_img = rng_np.standard_normal((64, D)).astype(np.float32)
db_txt = rng_np.standard_normal((64, D)).astype(np.float32)

mesh = make_mesh()
assert mesh.devices.size == 4 and local_mesh_size(mesh) == 2

# ---- 2-process train step: row-sharded DB, per-rank batches ---------------
db = KnowledgeDB.from_arrays(db_img, db_txt, dtype=jnp.float32)
db_s = db.shard_over(mesh)
retr = Retriever(db_s, mesh=mesh, sharded=True)

prompt = np.zeros((1, 77), np.int32)
prompt[0, :5] = [49406, 320, 1125, 539, 49407]
opt = optax.adamw(1e-3)
step = make_train_step(
    params, ccfg, retr, opt, stream="image", prompt_tokens=prompt,
    split_id=265, grad_scale=1.0 / mesh.devices.size,
    compute_dtype=jnp.float32,
)
rep = NamedSharding(mesh, P())
heads_r = jax.device_put(heads, rep)
opt_state = jax.device_put(opt.init(heads), rep)

# per-rank local batches (2 rows per local device), deterministic per rank
rank = jax.process_index()
def local_batch(r):
    g = np.random.default_rng(100 + r)
    return (g.standard_normal((4, D)).astype(np.float32),
            g.standard_normal((4, D)).astype(np.float32))
img_f, cap_f = local_batch(rank)
batch = TrainBatch(
    image_features=shard_batch(mesh, jnp.asarray(img_f))[0],
    caption_features=shard_batch(mesh, jnp.asarray(cap_f))[0],
    other_tokens=shard_batch(mesh, jnp.zeros((4, 77), jnp.int32))[0],
)
rng = jax.random.key(7)
heads2, opt2, loss = step(heads_r, opt_state, batch, rng)
loss2p = float(np.asarray(loss.addressable_data(0)))

# ---- single-replica reference on the assembled global batch ---------------
img_g = np.concatenate([local_batch(0)[0], local_batch(1)[0]])
cap_g = np.concatenate([local_batch(0)[1], local_batch(1)[1]])
retr_local = Retriever(db)
step_local = make_train_step(
    params, ccfg, retr_local, opt, stream="image", prompt_tokens=prompt,
    split_id=265, grad_scale=1.0 / mesh.devices.size,
    compute_dtype=jnp.float32,
)
batch_local = TrainBatch(
    image_features=jnp.asarray(img_g), caption_features=jnp.asarray(cap_g),
    other_tokens=jnp.zeros((8, 77), jnp.int32),
)
heads2_l, _, loss_l = step_local(heads, opt.init(heads), batch_local, rng)
assert abs(loss2p - float(loss_l)) < 1e-4, (loss2p, float(loss_l))

# updated heads must match the single-replica update and be identical
# across processes (replicated sharding)
leaf2p = np.asarray(heads2.img2text["fc_out"]["w"].addressable_data(0))
leaf_l = np.asarray(heads2_l.img2text["fc_out"]["w"])
np.testing.assert_allclose(leaf2p, leaf_l, rtol=1e-4, atol=1e-5)

# ---- 2-process eval corpus pass -------------------------------------------
# Eval loaders iterate the FULL dataset on every process (names stay
# aligned host-side); the global-feed path shards rows across all devices.
# 7 rows exercises the ragged tail (padded to the 4-device axis, trimmed).
from keds_tpu.evalkit.evaluators import EvalContext

ctx = EvalContext(clip_params=params, cfg=ccfg, retriever=retr,
                  compute_dtype=jnp.float32, mesh=mesh, db_topk=8)
imgs_g = np.random.default_rng(200).standard_normal(
    (7, 32, 32, 3)).astype(np.float32)
corpus_2p = fetch_global(ctx.image_features(jnp.asarray(imgs_g)))
assert corpus_2p.shape[0] == 7, corpus_2p.shape

ctx_local = EvalContext(clip_params=params, cfg=ccfg, retriever=retr_local,
                        compute_dtype=jnp.float32, db_topk=8)
corpus_l = np.asarray(ctx_local.image_features(jnp.asarray(imgs_g)))
np.testing.assert_allclose(corpus_2p, corpus_l, rtol=1e-4, atol=1e-5)

print(f"rank {jax.process_index()}: e2e train step + eval corpus OK "
      f"(loss {loss2p:.6f})")
"""


def test_two_process_train_step_and_eval_corpus():
    """VERDICT round-2 item 3: an actual train step (global-batch loss,
    row-sharded DB retrieval, replicated head update) and an eval corpus
    pass must run ACROSS PROCESSES and match a single-replica run on the
    assembled global batch."""
    port = _free_port()
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["TEST_DIST_URL"] = f"tcp://127.0.0.1:{port}"
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["WORLD_SIZE"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD_E2E], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO_ROOT),
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    losses = set()
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert "e2e train step + eval corpus OK" in out, out
        losses.add(out.split("loss ")[-1].split(")")[0])
    assert len(losses) == 1, losses  # identical replicated loss on both ranks


CHILD_SERVE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from keds_tpu.config import Config
from keds_tpu.parallel.mesh import make_mesh, maybe_init_distributed

cfg = Config(distributed=True, dist_url=os.environ["TEST_DIST_URL"])
maybe_init_distributed(cfg)
assert jax.process_count() == 2

import numpy as np
import jax.numpy as jnp

from keds_tpu.engine import ComposedQueryEngine
from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.retrieval.database import KnowledgeDB, Retriever

D = 32
ccfg = mclip.ClipConfig(
    embed_dim=D, image_resolution=32, vision_layers=1, vision_width=64,
    vision_patch_size=16, transformer_width=D, transformer_heads=1,
    transformer_layers=1,
)
params = mclip.init_clip(jax.random.key(0), ccfg)
k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
heads = FusionHeads(
    img2text=mheads.init_im2text(k1, D, 24, D),
    retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=2),
    text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=2),
)
rng_np = np.random.default_rng(0)
db = KnowledgeDB.from_arrays(rng_np.standard_normal((64, D)),
                             rng_np.standard_normal((64, D)),
                             dtype=jnp.float32)
corpus = rng_np.standard_normal((37, D)).astype(np.float32)  # pads to 40
corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)

mesh = make_mesh()
assert mesh.devices.size == 4

db_s = KnowledgeDB.from_arrays(np.asarray(db.image_db), np.asarray(db.text_db),
                               dtype=jnp.float32, normalize=False).shard_over(mesh)
eng = ComposedQueryEngine(
    params, ccfg, heads, db_s,
    retriever=Retriever(db_s, mesh=mesh, sharded=True),
    db_topk=8, compute_dtype=jnp.float32, mesh=mesh, encode_chunk=None,
)
dc = eng.corpus_to_device(corpus)

# Serving feed: EVERY process iterates the same query file/corpus dir —
# the global-feed contract (per-rank feeds would duplicate rows and
# misalign result names).  7 queries exercises the ragged tail.
q_g = np.random.default_rng(300).standard_normal(
    (7, 32, 32, 3)).astype(np.float32)
text_g = np.zeros((7, 77), np.int32)
text_g[:, :6] = [49406, 320, 1125, 539, 265, 49407]
scores, idx = eng.search([q_g], [jnp.asarray(text_g)], dc, topn=5)

# single-replica reference on the same batch
eng_l = ComposedQueryEngine(params, ccfg, heads, db, db_topk=8,
                            compute_dtype=jnp.float32, encode_chunk=None)
s_l, i_l = eng_l.search([jnp.asarray(q_g)], [jnp.asarray(text_g)], corpus,
                        topn=5)
assert scores.shape == (7, 5) and idx.shape == (7, 5), (scores.shape, idx.shape)
np.testing.assert_allclose(scores, s_l, rtol=1e-4, atol=1e-5)
assert (idx < 37).all()  # padding rows never surface
match = np.mean(idx == i_l)
assert match > 0.95, match  # only exact score ties may reorder

# corpus encode across processes keeps global order + full row set
enc_2p = eng.encode_corpus([q_g])
assert enc_2p.shape == (7, D)

print(f"rank {jax.process_index()}: 2-process engine serving OK "
      f"(top1 {idx[0, 0]})")
"""


def test_two_process_engine_serving():
    """Mesh SERVING across processes: the composed-query engine with a
    row-sharded DB + device-ranked sharded corpus must produce the
    single-replica results on per-rank query batches (and assemble
    batch-sharded outputs via fetch_global on every host)."""
    port = _free_port()
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["TEST_DIST_URL"] = f"tcp://127.0.0.1:{port}"
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["WORLD_SIZE"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD_SERVE], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO_ROOT),
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    top1 = set()
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert "2-process engine serving OK" in out, out
        top1.add(out.split("top1 ")[-1].split(")")[0])
    assert len(top1) == 1, top1  # identical global results on both ranks


CHILD_SUBSET = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from keds_tpu.config import Config
from keds_tpu.parallel.mesh import (
    local_mesh_size, make_mesh, maybe_init_distributed, shard_batch,
    shard_global_batch, fetch_global,
)

cfg = Config(distributed=True, dist_url=os.environ["TEST_DIST_URL"])
maybe_init_distributed(cfg)
assert jax.process_count() == 2
assert jax.device_count() == 8  # 4 local x 2 processes

import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

# --num-partitions semantics on a multi-process mesh (round-3 VERDICT
# weak #5: zero coverage).  4 of 8 devices -> 2 per process, equal split.
mesh = make_mesh(4)
assert mesh.devices.size == 4, mesh.devices.size
assert local_mesh_size(mesh) == 2, local_mesh_size(mesh)
procs_in_mesh = sorted({d.process_index for d in mesh.devices.flat})
assert procs_in_mesh == [0, 1], procs_in_mesh

# invalid asks fail loudly, oversized asks clamp
try:
    make_mesh(5)
    raise AssertionError("make_mesh(5) should have raised")
except ValueError:
    pass
assert make_mesh(16).devices.size == 8  # clamped with a warning

# ---- per-rank train feed (shard_batch) + one train step on the subset ----
from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.retrieval.database import KnowledgeDB, Retriever
from keds_tpu.train.losses import TrainBatch
from keds_tpu.train.trainer import make_train_step

D = 32
ccfg = mclip.ClipConfig(
    embed_dim=D, image_resolution=32, vision_layers=1, vision_width=64,
    vision_patch_size=16, transformer_width=D, transformer_heads=1,
    transformer_layers=1,
)
params = mclip.init_clip(jax.random.key(0), ccfg)
k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
heads = FusionHeads(
    img2text=mheads.init_im2text(k1, D, 24, D),
    retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=2),
    text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=2),
)
rng_np = np.random.default_rng(0)
db = KnowledgeDB.from_arrays(rng_np.standard_normal((64, D)).astype(np.float32),
                             rng_np.standard_normal((64, D)).astype(np.float32),
                             dtype=jnp.float32)
db_s = db.shard_over(mesh)
retr = Retriever(db_s, mesh=mesh, sharded=True)

prompt = np.zeros((1, 77), np.int32)
prompt[0, :5] = [49406, 320, 1125, 539, 49407]
opt = optax.adamw(1e-3)
step = make_train_step(
    params, ccfg, retr, opt, stream="image", prompt_tokens=prompt,
    split_id=265, grad_scale=1.0 / mesh.devices.size,
    compute_dtype=jnp.float32,
)
rep = NamedSharding(mesh, P())
heads_r = jax.device_put(heads, rep)
opt_state = jax.device_put(opt.init(heads), rep)

rank = jax.process_index()
def local_batch(r):
    g = np.random.default_rng(100 + r)
    return (g.standard_normal((4, D)).astype(np.float32),
            g.standard_normal((4, D)).astype(np.float32))
img_f, cap_f = local_batch(rank)
batch = TrainBatch(
    image_features=shard_batch(mesh, jnp.asarray(img_f))[0],
    caption_features=shard_batch(mesh, jnp.asarray(cap_f))[0],
    other_tokens=shard_batch(mesh, jnp.zeros((4, 77), jnp.int32))[0],
)
rng = jax.random.key(7)
heads2, opt2, loss = step(heads_r, opt_state, batch, rng)
loss_sub = float(np.asarray(loss.addressable_data(0)))

# single-replica reference on the assembled global batch
img_g = np.concatenate([local_batch(0)[0], local_batch(1)[0]])
cap_g = np.concatenate([local_batch(0)[1], local_batch(1)[1]])
retr_local = Retriever(db)
step_local = make_train_step(
    params, ccfg, retr_local, opt, stream="image", prompt_tokens=prompt,
    split_id=265, grad_scale=1.0 / mesh.devices.size,
    compute_dtype=jnp.float32,
)
batch_local = TrainBatch(
    image_features=jnp.asarray(img_g), caption_features=jnp.asarray(cap_g),
    other_tokens=jnp.zeros((8, 77), jnp.int32),
)
_, _, loss_l = step_local(heads, opt.init(heads), batch_local, rng)
assert abs(loss_sub - float(loss_l)) < 1e-4, (loss_sub, float(loss_l))

# ---- global eval/serve feed (shard_global_batch) on the subset mesh ------
# 7 rows exercises the ragged tail on the 4-device axis while 4 other
# local devices sit OUTSIDE the mesh.
x = np.random.default_rng(200).standard_normal((7, D)).astype(np.float32)
arr, n = shard_global_batch(mesh, x)
assert n == 7 and arr.shape[0] == 8
got = fetch_global(jax.jit(
    lambda a: a * 2.0,
    out_shardings=NamedSharding(mesh, P("data")))(arr))[:n]
np.testing.assert_allclose(got, x * 2.0, rtol=1e-6)

print(f"rank {jax.process_index()}: subset-mesh train+feed OK "
      f"(loss {loss_sub:.6f})")
"""


def test_two_process_subset_mesh_num_partitions():
    """--num-partitions > 0 on a multi-process mesh (round-3 VERDICT
    weak #5): equal per-process split, loud failure on non-multiples,
    clamped oversize, and BOTH feed contracts (shard_batch train step +
    shard_global_batch eval feed) while excluded local devices exist."""
    port = _free_port()
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["TEST_DIST_URL"] = f"tcp://127.0.0.1:{port}"
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env_base["WORLD_SIZE"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD_SUBSET], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO_ROOT),
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    losses = set()
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert "subset-mesh train+feed OK" in out, out
        losses.add(out.split("loss ")[-1].split(")")[0])
    assert len(losses) == 1, losses


CHILD_ORBAX_SAVE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from keds_tpu.config import Config
from keds_tpu.parallel.mesh import make_mesh, maybe_init_distributed

cfg = Config(distributed=True, dist_url=os.environ["TEST_DIST_URL"])
maybe_init_distributed(cfg)
assert jax.process_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from keds_tpu.io.checkpoint import load_orbax_heads, save_train_checkpoint
from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads

D = 32
ccfg = mclip.ClipConfig(
    embed_dim=D, image_resolution=32, vision_layers=1, vision_width=64,
    vision_patch_size=16, transformer_width=D, transformer_heads=1,
    transformer_layers=1,
)
params = mclip.init_clip(jax.random.key(0), ccfg)
k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
heads = FusionHeads(
    img2text=mheads.init_im2text(k1, D, 24, D),
    retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=2),
    text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=2),
)
mesh = make_mesh()
heads_r = jax.device_put(heads, NamedSharding(mesh, P()))
assert not jax.tree.leaves(heads_r)[0].is_fully_addressable

path = os.path.join(os.environ["TEST_OUT"], "epoch_1.pt")
# COLLECTIVE: every process calls save (the cli/main gating); orbax elects
# the writer internally.  A rank-0-only call deadlocks (round-4 finding).
save_train_checkpoint(path, epoch=1, name="t", clip_params=params,
                      clip_cfg=ccfg, heads=heads_r, fmt="orbax")
assert os.path.isdir(path)
# restore is likewise called by every process in real flows (resume / eval)
loaded, ep = load_orbax_heads(path)
assert ep == 1
for a, b in zip(jax.tree.leaves(heads), jax.tree.leaves(loaded)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
print(f"rank {jax.process_index()}: orbax collective save+restore OK")
"""


def test_two_process_orbax_collective_save():
    """Multi-process --checkpoint-format orbax: the save must run as a
    collective from every process and round-trip (a rank-0-only orbax save
    deadlocks on orbax's sync barriers — round-4 finding, fixed in
    cli/main.py's save gating + host-numpy conversion in _save_orbax)."""
    pytest.importorskip("orbax.checkpoint")
    import tempfile

    port = _free_port()
    outdir = tempfile.mkdtemp()
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["TEST_DIST_URL"] = f"tcp://127.0.0.1:{port}"
    env_base["TEST_OUT"] = outdir
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["WORLD_SIZE"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD_ORBAX_SAVE], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO_ROOT),
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert "orbax collective save+restore OK" in out, out


CHILD_NEIGHBORS = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from keds_tpu.config import Config
from keds_tpu.parallel.mesh import local_mesh_size, make_mesh, maybe_init_distributed, shard_batch

cfg = Config(distributed=True, dist_url=os.environ["TEST_DIST_URL"])
maybe_init_distributed(cfg)
assert jax.process_count() == 2

import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.ops.topk import mips_topk
from keds_tpu.retrieval.database import KnowledgeDB, Retriever
from keds_tpu.train.losses import TrainBatch
from keds_tpu.train.trainer import make_train_step

D = 32
ccfg = mclip.ClipConfig(
    embed_dim=D, image_resolution=32, vision_layers=1, vision_width=64,
    vision_patch_size=16, transformer_width=D, transformer_heads=1,
    transformer_layers=1,
)
params = mclip.init_clip(jax.random.key(0), ccfg)
k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
heads = FusionHeads(
    img2text=mheads.init_im2text(k1, D, 24, D),
    retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=2),
    text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=2),
)
rng_np = np.random.default_rng(0)
db = KnowledgeDB.from_arrays(rng_np.standard_normal((64, D)),
                             rng_np.standard_normal((64, D)), dtype=jnp.float32)
mesh = make_mesh()
db_s = db.shard_over(mesh)
retr = Retriever(db_s, mesh=mesh, sharded=True)

prompt = np.zeros((1, 77), np.int32)
prompt[0, :5] = [49406, 320, 1125, 539, 49407]
opt = optax.adamw(1e-3)
K = 4
step = make_train_step(
    params, ccfg, retr, opt, stream="image", prompt_tokens=prompt,
    split_id=265, grad_scale=1.0 / mesh.devices.size, db_topk=K,
    compute_dtype=jnp.float32,
)
rep = NamedSharding(mesh, P())
heads_r = jax.device_put(heads, rep)
opt_state = jax.device_put(opt.init(heads), rep)

rank = jax.process_index()
g = np.random.default_rng(100 + rank)
img_f = g.standard_normal((4, D)).astype(np.float32)
cap_f = g.standard_normal((4, D)).astype(np.float32)
# per-rank precomputed indices for the LOCAL rows (the pack rides the same
# per-rank train feed as the features), exact search like the tool
q = jnp.asarray(img_f)
q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
_, ii = mips_topk(q.astype(db.image_db.dtype), db.image_db, K)
_, ti = mips_topk(q.astype(db.text_db.dtype), db.text_db, K)

common = dict(
    image_features=shard_batch(mesh, jnp.asarray(img_f))[0],
    caption_features=shard_batch(mesh, jnp.asarray(cap_f))[0],
    other_tokens=shard_batch(mesh, jnp.zeros((4, 77), jnp.int32))[0],
)
rng = jax.random.key(7)
_, _, loss_s = step(heads_r, opt_state, TrainBatch(**common), rng)
_, _, loss_g = step(heads_r, opt_state, TrainBatch(
    **common,
    img_idx=shard_batch(mesh, ii)[0],
    txt_idx=shard_batch(mesh, ti)[0],
), rng)
ls = float(np.asarray(loss_s.addressable_data(0)))
lg = float(np.asarray(loss_g.addressable_data(0)))
assert lg == ls, (lg, ls)

# db_fingerprint must work on the NON-ADDRESSABLE sharded DB (the
# --neighbors staleness gate runs it at CLI startup on multi-host
# --db-shard runs) and must equal the unsharded fingerprint (packs are
# built against the unsharded tool DB; shard padding must not leak in).
from keds_tpu.retrieval.database import db_fingerprint
assert db_fingerprint(db_s) == db_fingerprint(db)

print(f"2-process neighbors step OK (bit-equal, loss {lg})")
"""


def test_two_process_neighbors_step_matches_search():
    """The precomputed-neighbor gather step under the REAL multi-process
    feed (per-rank batches + index fields through shard_batch, row-sharded
    DB) must equal the in-step search bit for bit on both ranks."""
    port = _free_port()
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["TEST_DIST_URL"] = f"tcp://127.0.0.1:{port}"
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["WORLD_SIZE"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD_NEIGHBORS], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO_ROOT),
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    losses = set()
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert "2-process neighbors step OK" in out, out
        losses.add(out.split("loss ")[-1].strip())
    assert len(losses) == 1, losses


CHILD_RAW = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from keds_tpu.config import Config
from keds_tpu.parallel.mesh import (
    local_mesh_size, make_mesh, maybe_init_distributed, shard_batch,
)

cfg = Config(distributed=True, dist_url=os.environ["TEST_DIST_URL"])
maybe_init_distributed(cfg)
assert jax.process_count() == 2

import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.retrieval.database import KnowledgeDB, Retriever
from keds_tpu.train.losses import RawBatch
from keds_tpu.train.trainer import make_train_step

D = 32
ccfg = mclip.ClipConfig(
    embed_dim=D, image_resolution=32, vision_layers=1, vision_width=64,
    vision_patch_size=16, transformer_width=D, transformer_heads=1,
    transformer_layers=1,
)
params = mclip.init_clip(jax.random.key(0), ccfg)
k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
heads = FusionHeads(
    img2text=mheads.init_im2text(k1, D, 24, D),
    retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=2),
    text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=2),
)
rng_np = np.random.default_rng(0)
db = KnowledgeDB.from_arrays(rng_np.standard_normal((64, D)).astype(np.float32),
                             rng_np.standard_normal((64, D)).astype(np.float32),
                             dtype=jnp.float32)

mesh = make_mesh()
assert mesh.devices.size == 4 and local_mesh_size(mesh) == 2
db_s = db.shard_over(mesh)
retr = Retriever(db_s, mesh=mesh, sharded=True)

prompt = np.zeros((1, 77), np.int32)
prompt[0, :5] = [49406, 320, 1125, 539, 49407]
opt = optax.adamw(1e-3)
# encode_chunk=2 with 4 rows/device exercises the per-shard chunk loop
# (shard_map moves the b-chunk schedule INSIDE each shard; chunking the
# global batch would reshape the sharded axis).
step = make_train_step(
    params, ccfg, retr, opt, stream="image", prompt_tokens=prompt,
    split_id=265, grad_scale=1.0 / mesh.devices.size,
    compute_dtype=jnp.float32, encode_chunk=2, mesh=mesh,
)
rep = NamedSharding(mesh, P())
heads_r = jax.device_put(heads, rep)
opt_state = jax.device_put(opt.init(heads), rep)

# per-rank RAW batches: 8 images (4 per local device) + unbucketed S=77
# caption tokens, as the tarstream feed produces (rank-cycled shards ->
# per-rank local rows through shard_batch)
rank = jax.process_index()
def local_raw(r):
    g = np.random.default_rng(100 + r)
    imgs = g.standard_normal((8, 32, 32, 3)).astype(np.float32)
    caps = np.zeros((8, 77), np.int32)
    caps[:, 0] = 49406
    caps[:, 1] = 320 + g.integers(0, 50, size=8)
    caps[:, 2] = 49407
    return imgs, caps
imgs_f, caps_f = local_raw(rank)
batch = RawBatch(
    images=shard_batch(mesh, jnp.asarray(imgs_f))[0],
    caption_tokens=shard_batch(mesh, jnp.asarray(caps_f))[0],
    other_tokens=shard_batch(mesh, jnp.zeros((8, 77), jnp.int32))[0],
)
rng = jax.random.key(7)
heads2, opt2, loss = step(heads_r, opt_state, batch, rng)
loss2p = float(np.asarray(loss.addressable_data(0)))

# single-replica reference: assembled global raw batch, same chunk schedule
imgs_g = np.concatenate([local_raw(0)[0], local_raw(1)[0]])
caps_g = np.concatenate([local_raw(0)[1], local_raw(1)[1]])
retr_local = Retriever(db)
step_local = make_train_step(
    params, ccfg, retr_local, opt, stream="image", prompt_tokens=prompt,
    split_id=265, grad_scale=1.0 / mesh.devices.size,
    compute_dtype=jnp.float32, encode_chunk=2,
)
batch_local = RawBatch(
    images=jnp.asarray(imgs_g), caption_tokens=jnp.asarray(caps_g),
    other_tokens=jnp.zeros((16, 77), jnp.int32),
)
heads2_l, _, loss_l = step_local(heads, opt.init(heads), batch_local, rng)
assert abs(loss2p - float(loss_l)) < 1e-4, (loss2p, float(loss_l))

leaf2p = np.asarray(heads2.img2text["fc_out"]["w"].addressable_data(0))
leaf_l = np.asarray(heads2_l.img2text["fc_out"]["w"])
np.testing.assert_allclose(leaf2p, leaf_l, rtol=1e-4, atol=1e-5)

print(f"rank {jax.process_index()}: 2-process raw train step OK "
      f"(loss {loss2p:.6f})")
"""


def test_two_process_raw_train_step_matches_single_replica():
    """Round-4 VERDICT item 7: the RAW train path across processes — per-rank
    raw image+caption batches through shard_batch, in-step frozen-CLIP encode
    with the per-shard chunk schedule (encode_raw_batch via
    encode_image_chunked_mesh), row-sharded DB retrieval — must match a
    single-replica step on the assembled global raw batch (loss AND updated
    heads), with identical replicated loss on both ranks."""
    port = _free_port()
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["TEST_DIST_URL"] = f"tcp://127.0.0.1:{port}"
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["WORLD_SIZE"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD_RAW], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO_ROOT),
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    losses = set()
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert "2-process raw train step OK" in out, out
        losses.add(out.split("loss ")[-1].split(")")[0])
    assert len(losses) == 1, losses


CHILD_TEXT_BUCKET_CLI = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from keds_tpu.cli.main import main as train_main

args = [
    "--train-data", os.environ["TEST_FEAT"], "--dataset-type", "directory",
    "--clip-weights", os.environ["TEST_CKPT"],
    "--database-path", os.environ["TEST_DBDIR"],
    "--batch-size", "4", "--epochs", "1", "--warmup", "2",
    "--lr", "1e-3", "--precision", "fp32", "--workers", "0",
    "--logs", os.environ["TEST_LOGS"], "--name", os.environ["TEST_NAME"],
    "--db-topk", "4", "--stream", "text", "--seed", "0",
]
if os.environ.get("TEST_DIST_URL"):
    args += ["--distributed", "--dist-url", os.environ["TEST_DIST_URL"]]
train_main(args)
print("text train cli done")
"""


def _text_bucket_fixture(tmp_path):
    """Synthetic packed-feature set whose 'other' captions span two causal-
    prefix buckets (short -> S=16, ~18 words -> S=32; nothing needs 77)."""
    import json

    import jax
    import numpy as np

    from keds_tpu.io.checkpoint import save_train_checkpoint
    from keds_tpu.io.pt import save_pt
    from keds_tpu.models import clip as mclip, heads as mheads
    from keds_tpu.models.composition import FusionHeads

    d = 64
    ccfg = mclip.ClipConfig(
        embed_dim=d, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, transformer_width=d, transformer_heads=1,
        transformer_layers=2,
    )
    params = mclip.init_clip(jax.random.key(0), ccfg)
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    heads = FusionHeads(
        img2text=mheads.init_im2text(k1, d, 48, d),
        retrieval_fuse=mheads.init_crossformer(k2, d, d, d, num_layers=3),
        text_condition=mheads.init_crossformer(k3, d, d, d, num_layers=3),
    )
    ckpt = str(tmp_path / "clip_ckpt.pt")
    save_train_checkpoint(ckpt, epoch=1, name="t", clip_params=params,
                          clip_cfg=ccfg, heads=heads)

    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "features"
    feat_dir.mkdir()
    n = 32
    np.save(feat_dir / "image_features.npy",
            rng.standard_normal((n, d)).astype(np.float32))
    np.save(feat_dir / "text_features.npy",
            rng.standard_normal((n, d)).astype(np.float32))
    names = [f"s{i}" for i in range(n)]
    long_cap = ("* wearing a bright red scarf sitting on a wooden bench in "
                "the park next to a small brown dog")
    others = {m: (long_cap if i % 3 == 0 else "* on a table")
              for i, m in enumerate(names)}
    (feat_dir / "names.json").write_text(json.dumps(names))
    (feat_dir / "cc_subject.json").write_text(
        json.dumps({m: "a thing" for m in names}))
    (feat_dir / "cc_other.json").write_text(json.dumps(others))

    db_dir = tmp_path / "db"
    db_dir.mkdir()
    save_pt(np.float32(rng.standard_normal((32, d))),
            str(db_dir / "cc_image_databases.pt"))
    save_pt(np.float32(rng.standard_normal((32, d))),
            str(db_dir / "cc_text_databases.pt"))
    (db_dir / "database_names.txt").write_text(
        "\n".join(f"s{i}" for i in range(32)))
    return str(feat_dir), str(db_dir), ckpt


def test_two_process_text_stream_bucketed_cli_matches_single_process(tmp_path):
    """Round-4 VERDICT item 1: multi-process text-stream training must run
    the S=16/32 causal-prefix bucket programs (not silently fall back to
    S=77) with a trajectory matching the single-process bucketed run.

    Mechanism under test: per-sample needs (pure function of the dataset,
    identical on every rank) + the shared-permutation global batch slice
    give every rank the same per-step bucket; the block rank assignment in
    DataLoader._indices makes the assembled global array identical to the
    single-process feed, so the trajectories agree."""
    import re

    port = _free_port()
    feat, dbdir, ckpt = _text_bucket_fixture(tmp_path)
    env_base = dict(os.environ)
    env_base.pop("WORLD_SIZE", None)
    env_base.pop("RANK", None)
    env_base["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["TEST_FEAT"] = feat
    env_base["TEST_DBDIR"] = dbdir
    env_base["TEST_CKPT"] = ckpt
    env_base["TEST_LOGS"] = str(tmp_path / "logs")

    procs = []
    # 2-process run: 1 local device each, world mesh of 2
    for rank in range(2):
        env = dict(env_base)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["TEST_DIST_URL"] = f"tcp://127.0.0.1:{port}"
        env["TEST_NAME"] = "mp"
        env["WORLD_SIZE"] = "2"
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD_TEXT_BUCKET_CLI], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO_ROOT),
        ))
    # single-process comparator: same 2-device world in one process (same
    # global batches, same grad_scale) through the bucket_text feed path
    env = dict(env_base)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["TEST_DIST_URL"] = ""
    env["TEST_NAME"] = "sp"
    procs.append(subprocess.Popen(
        [sys.executable, "-c", CHILD_TEXT_BUCKET_CLI], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(REPO_ROOT),
    ))

    outs = [p.communicate(timeout=600) for p in procs]
    buckets = []
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{err[-3000:]}"
        assert "text train cli done" in out, out
        got = sorted(set(int(m) for m in
                         re.findall(r"causal-prefix bucket S=(\d+)", err)))
        assert got, f"child {i} logged no bucket lines:\n{err[-2000:]}"
        assert 77 not in got, f"child {i} fell back to S=77: {got}"
        buckets.append(got)
    # every rank AND the single-process comparator ran the same bucket set
    assert buckets[0] == buckets[1] == buckets[2], buckets
    assert any(b in (16, 32) for b in buckets[0]), buckets[0]

    from keds_tpu.io.checkpoint import load_heads_checkpoint
    import jax
    import numpy as np

    h_mp, _ = load_heads_checkpoint(
        str(tmp_path / "logs" / "mp" / "checkpoints" / "epoch_1.pt"))
    h_sp, _ = load_heads_checkpoint(
        str(tmp_path / "logs" / "sp" / "checkpoints" / "epoch_1.pt"))
    for a, b in zip(jax.tree.leaves(h_mp), jax.tree.leaves(h_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


CHILD_EVAL_DEVRANK = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from keds_tpu.config import Config
from keds_tpu.parallel.mesh import make_mesh, maybe_init_distributed

cfg = Config(distributed=True, dist_url=os.environ["TEST_DIST_URL"])
maybe_init_distributed(cfg)
assert jax.process_count() == 2

import json
import numpy as np
import jax.numpy as jnp
from PIL import Image

from keds_tpu.data.datasets import CIRR
from keds_tpu.data.loader import DataLoader
from keds_tpu.evalkit.evaluators import EvalContext, evaluate_cirr
from keds_tpu.io.checkpoint import save_train_checkpoint
from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.retrieval.database import KnowledgeDB, Retriever
from keds_tpu.transforms import image_transform

D = 32
ccfg = mclip.ClipConfig(
    embed_dim=D, image_resolution=32, vision_layers=1, vision_width=64,
    vision_patch_size=16, transformer_width=D, transformer_heads=1,
    transformer_layers=1,
)
params = mclip.init_clip(jax.random.key(0), ccfg)

# Every rank builds an identical fixture tree locally (fixed seeds) — eval
# loaders iterate the FULL dataset on each process, so only values must
# match, not paths.
tmp = os.environ["TEST_LOCAL_TMP"] + f"/rank{jax.process_index()}"
for branch, seed in (("image_branch", 2), ("text_branch", 3)):
    for ep in (1, 2):
        k1, k2, k3 = jax.random.split(jax.random.key(seed + 10 * ep), 3)
        heads = FusionHeads(
            img2text=mheads.init_im2text(k1, D, 24, D),
            retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=2),
            text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=2),
        )
        save_train_checkpoint(
            os.path.join(tmp, branch, f"epoch_{ep}.pt"), epoch=ep, name="t",
            clip_params=params, clip_cfg=ccfg, heads=heads)

rng = np.random.default_rng(0)
root = os.path.join(tmp, "data")
base = os.path.join(root, "CIRR")
for d in ("dev", "captions", "image_splits"):
    os.makedirs(os.path.join(base, d))
names = [f"img{i}" for i in range(11)]  # odd corpus: ragged on the 2-axis
for n in names:
    Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)
                    ).save(os.path.join(base, "dev", f"{n}.png"))
caps = [{"reference": names[q], "target_hard": names[(q + 2) % 11],
         "caption": f"turn thing {q} around"} for q in range(5)]
with open(os.path.join(base, "captions", "cap.rc2.val.json"), "w") as f:
    json.dump(caps, f)
with open(os.path.join(base, "image_splits", "split.rc2.val.json"), "w") as f:
    json.dump({n: f"dev/{n}.png" for n in names}, f)

mesh = make_mesh()
assert mesh.devices.size == 2
db = KnowledgeDB.from_arrays(
    rng.standard_normal((64, D)).astype(np.float32),
    rng.standard_normal((64, D)).astype(np.float32), dtype=jnp.float32)
db_s = db.shard_over(mesh)
t_val = image_transform(ccfg.image_resolution)

results = {}
for ranking in ("host", "device"):
    src = CIRR(transforms=t_val, root=root)
    tgt = CIRR(transforms=t_val, root=root, mode="imgs")
    ctx = EvalContext(
        clip_params=params, cfg=ccfg,
        retriever=Retriever(db_s, mesh=mesh, sharded=True),
        image_branch=os.path.join(tmp, "image_branch"),
        text_branch=os.path.join(tmp, "text_branch"),
        compute_dtype=jnp.float32, db_topk=8, mesh=mesh,
        eval_ranking=ranking,
    )
    results[ranking] = evaluate_cirr(ctx, DataLoader(src, 3),
                                     DataLoader(tgt, 4), epochs=[1, 2])

assert results["host"] == results["device"], (
    results["host"], results["device"])
r1 = results["device"][(1, "mixture")]["recall_R@1"]
print(f"rank {jax.process_index()}: 2-process eval devrank OK R@1={r1:.4f}")
"""


def test_two_process_eval_device_ranking_matches_host(tmp_path):
    """Round-5: --eval-ranking device across PROCESSES — composed queries
    stay sharded over the 2-process mesh, the corpus is replicated, the
    top-101 rank reduction runs on device, and the gathered index matrix
    must yield the exact metric table of the multi-process HOST path (which
    assembles full features via fetch_global)."""
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("WORLD_SIZE", None)
    env_base.pop("RANK", None)
    env_base["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env_base["TEST_DIST_URL"] = f"tcp://127.0.0.1:{port}"
    env_base["TEST_LOCAL_TMP"] = str(tmp_path)
    env_base["WORLD_SIZE"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD_EVAL_DEVRANK], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO_ROOT),
        ))
    outs = [p.communicate(timeout=600) for p in procs]
    lines = []
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert "2-process eval devrank OK" in out, out
        lines.append(out.strip().splitlines()[-1].split("R@1=")[1])
    assert lines[0] == lines[1], lines  # both ranks computed the same table
