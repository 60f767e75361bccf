"""Trainer: data pipeline, sharded train step, loss decrease, checkpoints."""

import glob
import os

import jax
import numpy as np
import pytest

from scp_tpu.config import Config, load_config
from scp_tpu.core import build_octree, gen_context
from scp_tpu.train.data import ShardDataset, build_dataset
from scp_tpu.train.trainer import Trainer, cross_entropy_bits


def make_shards(tmp_path, rng, n_files=2, bits=6):
    for i in range(n_files):
        pts = np.unique(rng.integers(0, 2**bits, (3000, 3)), axis=0)
        ctx = gen_context(build_octree(pts))
        np.save(tmp_path / f"shard{i}_{ctx.shape[0]}.npy", ctx)
    return str(tmp_path / "*.npy")


def tiny_cfg(root, mode="ehem"):
    cfg = load_config(
        "train_kitti_ehem.yaml" if mode == "ehem" else "train_kitti.yaml",
        config_dir="configs",
    )
    cfg.data.root = root
    cfg.data.batch_size = 2
    cfg.data.context_size = 64
    cfg.bf16 = False
    cfg.train.lr = 1e-3
    if mode == "ehem":
        cfg.model.context_size = 64
        cfg.model.swin = Config.wrap(
            dict(embed_dim=64, self_depths=[2, 2], cross_depths=[1],
                 num_heads=2, window_size=16, mlp_ratio=2.0)
        )
    else:
        cfg.model.context_size = 64
    return cfg


def test_shard_dataset_shapes(tmp_path, rng):
    root = make_shards(tmp_path, rng)
    ds = ShardDataset(root, context_size=64, batch_size=2, mode="ehem")
    batch = next(ds.batches())
    assert batch["data"].shape == (2, 64, 4, 3)
    assert batch["pos"].shape == (2, 64, 3)
    assert batch["label"].shape == (2, 64)
    # labels equal the occupancy channel of the current node
    np.testing.assert_array_equal(batch["label"], batch["data"][:, :, -1, 2])
    assert batch["data"][:, :, :, 2].max() <= 255
    assert batch["pos"].min() >= 0 and batch["pos"].max() <= 1


def test_octattn_dataset_shapes(tmp_path, rng):
    root = make_shards(tmp_path, rng)
    ds = ShardDataset(root, context_size=32, batch_size=2, mode="octattn")
    batch = next(ds.batches())
    assert batch["data"].shape == (2, 32, 4, 3)
    assert batch["pos"].shape == (2, 32, 4, 3)
    np.testing.assert_array_equal(batch["label"], batch["data"][:, :, -1, 0])


def test_vari_data_len_buckets(tmp_path, rng):
    """Variable-length sampling only produces lengths from the bucket set
    (bounded XLA program count by construction)."""
    from scp_tpu.train.data import EHEM_LEN_BUCKETS

    root = make_shards(tmp_path, rng, bits=7)
    ds = ShardDataset(
        root, context_size=8192, batch_size=1, mode="ehem",
        vari_data_len=True, seed=3,
    )
    gen = ds.batches()
    seen = {next(gen)["data"].shape[1] for _ in range(30)}
    allowed = set(EHEM_LEN_BUCKETS) | {8192}
    assert seen <= allowed
    assert len(seen) > 1  # truncation actually triggers (p=0.3)


def test_cross_entropy_bits():
    logits = np.zeros((2, 4, 255), np.float32)
    labels = np.zeros((2, 4), np.int32)
    bits = float(cross_entropy_bits(logits, labels))
    assert bits == pytest.approx(np.log2(255.0), rel=1e-5)


def test_training_reduces_loss(tmp_path, rng):
    root = make_shards(tmp_path, rng)
    cfg = tiny_cfg(root)
    ds = build_dataset(cfg)
    trainer = Trainer(cfg, steps_per_epoch=10)
    gen = ds.batches()
    first = next(gen)
    state = trainer.init_state(first)
    state, loss0 = trainer.train_step(state, first)
    losses = [float(loss0)]
    for _ in range(25):
        state, loss = trainer.train_step(state, next(gen))
        losses.append(float(loss))
    assert losses[0] > 7.5  # ~log2(255) at init
    assert min(losses[-5:]) < losses[0] - 0.5, losses


def test_train_step_with_remat(tmp_path, rng):
    """The bench-checkpoint recipe trains with remat=True — the rematerialized
    blocks must accept the (traced tensors, static train flag) split."""
    root = make_shards(tmp_path, rng)
    cfg = tiny_cfg(root)
    cfg.remat = True
    ds = build_dataset(cfg)
    trainer = Trainer(cfg, steps_per_epoch=10)
    gen = ds.batches()
    first = next(gen)
    state = trainer.init_state(first)
    state, loss = trainer.train_step(state, first)
    assert np.isfinite(float(loss))


def test_fit_writes_checkpoint_and_metrics(tmp_path, rng):
    root = make_shards(tmp_path, rng)
    cfg = tiny_cfg(root)
    cfg.train.epoch = 1
    ds = build_dataset(cfg)
    trainer = Trainer(cfg, steps_per_epoch=3)
    run_dir = str(tmp_path / "run")
    trainer.fit(ds, run_dir, epochs=1)
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    from scp_tpu.train import checkpoints

    ck = checkpoints.latest_checkpoint(run_dir)
    assert ck is not None
    variables = checkpoints.load_variables(ck)
    assert "params" in variables


def test_resume_continues_from_checkpoint(tmp_path, rng):
    root = make_shards(tmp_path, rng)
    cfg = tiny_cfg(root)
    ds = build_dataset(cfg)
    run_dir = str(tmp_path / "run")

    t1 = Trainer(cfg, steps_per_epoch=3)
    t1.fit(ds, run_dir, epochs=1)

    # second trainer resumes: starts at epoch 1, step continues from 3
    t2 = Trainer(cfg, steps_per_epoch=3)
    state = t2.fit(build_dataset(cfg), run_dir, epochs=2, resume=True)
    assert int(state.step) == 6
    from scp_tpu.train import checkpoints

    ck = checkpoints.latest_checkpoint(run_dir)
    assert "step=6" in ck


def test_batches_step_deterministic(tmp_path, rng):
    """Batch s is a pure function of the global step s: a stream opened at
    start_step=k replays exactly what an uninterrupted stream yielded from
    step k on, across epoch boundaries (resume-order contract)."""
    root = make_shards(tmp_path, rng)
    kw = dict(context_size=64, batch_size=2, mode="ehem",
              vari_data_len=True, seed=5)
    ds1 = ShardDataset(root, **kw)
    spe = ds1.steps_per_epoch()
    n = 2 * spe + 2  # crosses an epoch boundary
    gen = ds1.batches()
    ref = [next(gen) for _ in range(n)]
    k = spe - 1
    gen2 = ShardDataset(root, **kw).batches(start_step=k)
    for want in ref[k:]:
        got = next(gen2)
        for key in ("data", "pos", "label"):
            np.testing.assert_array_equal(got[key], want[key])
    # different epochs draw different window permutations
    assert any(
        ref[i]["data"].shape != ref[i + spe]["data"].shape
        or not np.array_equal(ref[i]["data"], ref[i + spe]["data"])
        for i in range(spe)
    )


def test_resume_matches_uninterrupted_run(tmp_path, rng):
    """Interrupted-then-resumed training lands on the SAME parameters as an
    uninterrupted run: no batch is consumed for init_state, and the resumed
    stream continues the epoch-keyed data order (round-3 dropped the first
    prefetched batch and replayed epoch-0 order)."""
    root = make_shards(tmp_path, rng)
    cfg = tiny_cfg(root)

    tA = Trainer(cfg, steps_per_epoch=3)
    sA = tA.fit(build_dataset(cfg), str(tmp_path / "A"), epochs=2)

    runB = str(tmp_path / "B")
    Trainer(cfg, steps_per_epoch=3).fit(build_dataset(cfg), runB, epochs=1)
    sB = Trainer(cfg, steps_per_epoch=3).fit(
        build_dataset(cfg), runB, epochs=2, resume=True
    )
    assert int(sA.step) == int(sB.step) == 6
    for a, b in zip(
        jax.tree_util.tree_leaves(sA.params), jax.tree_util.tree_leaves(sB.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_process_sliced_batches_compose_to_global(tmp_path, rng):
    """Multi-host data contract (train/distributed.py): P process-local
    datasets, stacked in process order, reproduce exactly the single-
    process global batch stream — the global batch content is independent
    of the process count."""
    root = make_shards(tmp_path, rng)
    kw = dict(context_size=64, mode="ehem", vari_data_len=True, seed=9)
    ds1 = ShardDataset(root, batch_size=4, **kw)
    parts = [
        ShardDataset(
            root, batch_size=2, process_index=p, process_count=2, **kw
        )
        for p in range(2)
    ]
    assert ds1.steps_per_epoch() == parts[0].steps_per_epoch()
    g = ds1.batches()
    gs = [p.batches() for p in parts]
    for _ in range(2 * ds1.steps_per_epoch() + 1):
        want = next(g)
        got = [next(x) for x in gs]
        for key in ("data", "pos", "label"):
            np.testing.assert_array_equal(
                want[key], np.concatenate([b[key] for b in got])
            )


def test_distributed_single_process_smoke(tmp_path, rng):
    """SCP_COORDINATOR-gated jax.distributed bring-up: initialize a
    1-process cluster, run real training steps through put_global
    (SURVEY §2.6 multi-host entry).  jax.distributed.initialize must
    precede backend creation, so the smoke runs in a subprocess."""
    import subprocess
    import sys

    from scp_tpu.train import distributed

    assert distributed.maybe_initialize(env={}) == 0  # unset -> no-op

    root = make_shards(tmp_path, rng)
    prog = f"""
import jax
# the axon sitecustomize overrides JAX_PLATFORMS; pin CPU explicitly
jax.config.update("jax_platforms", "cpu")
from scp_tpu.train.distributed import maybe_initialize
assert maybe_initialize() == 0
assert jax.process_count() == 1
from tests.test_train import tiny_cfg
from scp_tpu.train.data import build_dataset
from scp_tpu.train.trainer import Trainer
cfg = tiny_cfg({str(root)!r})
state = Trainer(cfg, steps_per_epoch=2).fit(
    build_dataset(cfg), {str(tmp_path / "dist")!r}, epochs=1
)
assert int(state.step) == 2
print("DIST_SMOKE_OK")
"""
    env = dict(
        os.environ,
        SCP_COORDINATOR="localhost:12357",
        SCP_NUM_PROCESSES="1",
        SCP_PROCESS_ID="0",
        JAX_PLATFORMS="cpu",
    )
    out = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True,
        text=True, timeout=580, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert "DIST_SMOKE_OK" in out.stdout, out.stderr[-2000:]


def test_warm_start_partial(tmp_path, rng):
    from scp_tpu.train import checkpoints

    root = make_shards(tmp_path, rng)
    cfg = tiny_cfg(root)
    ds = build_dataset(cfg)
    run_dir = str(tmp_path / "runA")
    t1 = Trainer(cfg, steps_per_epoch=2)
    t1.fit(ds, run_dir, epochs=1)
    ck = checkpoints.latest_checkpoint(run_dir)

    cfg2 = tiny_cfg(root)
    cfg2.train.load_pretrain = ck
    t2 = Trainer(cfg2, steps_per_epoch=1)
    t2.fit(build_dataset(cfg2), str(tmp_path / "runB"), epochs=1)


def test_warm_start_from_npz(tmp_path, rng):
    """load_pretrain accepts the committed .npz bench-checkpoint format
    (the orbax run dir does not survive container resets; the npz does)."""
    from scp_tpu.train import checkpoints

    root = make_shards(tmp_path, rng)
    cfg = tiny_cfg(root)
    ds = build_dataset(cfg)
    t1 = Trainer(cfg, steps_per_epoch=2)
    state = t1.fit(ds, str(tmp_path / "runA"), epochs=1)
    npz = str(tmp_path / "ck.npz")
    variables = {"params": jax.device_get(state.params)}
    if state.batch_stats:
        variables["batch_stats"] = jax.device_get(state.batch_stats)
    checkpoints.save_params_npz(npz, variables)

    cfg2 = tiny_cfg(root)
    cfg2.train.load_pretrain = npz
    t2 = Trainer(cfg2, steps_per_epoch=1)
    ds2 = build_dataset(cfg2)
    gen = ds2.batches()
    state2 = t2.init_state(next(gen))
    import dataclasses

    pre = checkpoints.load_params_npz(npz)["params"]
    warm = dataclasses.replace(
        state2, params=checkpoints.filter_compatible(pre, state2.params)
    )
    # at least one leaf must actually have been replaced (f16 round-trip
    # of the trained value, not the fresh init)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(warm.params)
    match = sum(
        np.allclose(np.asarray(x, np.float16), np.asarray(y), atol=1e-3)
        for x, y in zip(a, b)
        if np.shape(x) == np.shape(y)
    )
    assert match == len(a)
    # and the fit() entry point runs end to end with the npz path
    t2.fit(ds2, str(tmp_path / "runB"), epochs=1)


def test_prefetch_propagates_worker_errors():
    """A dead prefetch worker must raise in the consumer, not end the
    stream silently (a truncated shard once surfaced as StopIteration)."""
    from scp_tpu.train.data import prefetch

    def boom():
        yield 1
        raise ValueError("worker died")

    g = prefetch(boom())
    assert next(g) == 1
    with pytest.raises(ValueError, match="worker died"):
        next(g)
    assert list(prefetch(iter(range(3)))) == [0, 1, 2]


def test_lr_schedule_steps_per_epoch():
    from scp_tpu.train.trainer import make_lr_schedule

    cfg = load_config("train_kitti_ehem.yaml", config_dir="configs")
    sched = make_lr_schedule(cfg, steps_per_epoch=100)
    assert sched(0) == pytest.approx(1e-4)
    assert sched(299) == pytest.approx(1e-4)  # epochs 0-2
    assert sched(300) == pytest.approx(1e-4 * 0.3)  # epoch 3
    assert sched(600) == pytest.approx(1e-4 * 0.09)


def test_multidevice_dryrun():
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)
