"""Strong-scaling evidence for the sharded codec + DP trainer.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m scp_tpu.tools.scaling_curve

This image has ONE physical core, so wall-clock on the virtual 8-CPU mesh
cannot show speedup (the devices timeshare the core).  What CAN be shown
honestly is that XLA actually divides the work: for each mesh size we
compile the real programs (the codec's grouped phase-1 call and the
trainer's train_step) and read the compiler's per-device cost analysis —
per-device FLOPs must scale ~1/N if the lane/batch sharding is real, and
stay flat if everything silently replicates.  The real-chip throughput
anchor comes from bench.py; combining the two gives the v5e-8 projection
recorded in BUILDLOG.md.
"""

from __future__ import annotations

import os


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax: one dict per device
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from scp_tpu.codec.ehem_codec import EHEMCodec
    from scp_tpu.models.ehem import EHEM

    csz = 512
    model = EHEM(
        self_depths=(2, 2), cross_depths=(1,), embed_dim=64, num_heads=2,
        window_size=16, mlp_ratio=2.0, knn_k=4,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8, 4, 3), np.int32),
        np.zeros((1, 8, 3), np.float32),
    )

    print(f"{'devices':>8} {'codec p1 GFLOP/dev':>20} {'train GFLOP/dev':>18}")
    rows = []
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
        codec = EHEMCodec(
            model, variables, context_size=csz, group_size=8, mesh=mesh
        )
        # the grouped phase-1 program exactly as the codec dispatches it:
        # 8 lanes sharded over the mesh's data axis
        b_cap = 8 * csz
        db = codec._replicate_or_put(np.zeros((b_cap, 4, 3), np.int32))
        pb = codec._replicate_or_put(np.zeros((b_cap, 3), np.int32))
        lowered = jax.jit(
            codec._p1_buf_fn.__wrapped__, static_argnums=(7, 8)
        ).lower(
            codec.variables, db, pb, np.int32(0), np.int32(2**31 - 1),
            np.int32(0), np.float32(1.0), 8, csz,
        )
        # cost_analysis() of an SPMD-partitioned module is already
        # per-device (XLA compiles the per-shard program)
        f_codec = _flops(lowered.compile()) / 1e9

        from scp_tpu.config import load_config
        from scp_tpu.train.trainer import Trainer

        cfg = load_config("train_kitti_ehem.yaml", config_dir="configs")
        cfg.model.swin = dict(
            embed_dim=64, self_depths=[2, 2], cross_depths=[1],
            num_heads=2, window_size=16, mlp_ratio=2.0,
        )
        cfg.data.batch_size = 8
        cfg.bf16 = False
        trainer = Trainer(cfg, steps_per_epoch=10, mesh=mesh)
        rng = np.random.default_rng(0)
        batch = {
            "data": rng.integers(0, 9, (8, csz, 4, 3)).astype(np.int32),
            "pos": rng.random((8, csz, 3)).astype(np.float32),
            "label": rng.integers(0, 255, (8, csz)).astype(np.int32),
        }
        state = trainer.init_state(batch)
        step = trainer._build_step()
        import jax.numpy as jnp

        b_dev = jax.device_put(
            {k: jnp.asarray(v) for k, v in batch.items()}, trainer.batch_shard
        )
        f_train = _flops(step.lower(state, b_dev).compile()) / 1e9

        rows.append((n, f_codec, f_train))
        print(f"{n:>8} {f_codec:>20.3f} {f_train:>18.3f}")

    r1 = rows[0]
    for n, fc, ft in rows[1:]:
        print(
            f"# {n} devices: codec work/dev = {fc / r1[1]:.3f}x of 1-dev, "
            f"train work/dev = {ft / r1[2]:.3f}x (ideal {1 / n:.3f}x)"
        )
    return rows


if __name__ == "__main__":
    main()
