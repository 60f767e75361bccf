"""pjit data-parallel trainer (mesh axis "data").

Replaces the reference's PyTorch-Lightning DDP trainer (reference
train.py:42-53) with the TPU-native recipe: one jax.sharding.Mesh over all
chips, batch sharded on the leading axis, parameters replicated, gradient
all-reduce emitted by XLA as ICI collectives.  Multi-host scale-out only
needs jax.distributed.initialize() before mesh construction.

Parity points:
  * loss = cross-entropy / ln 2 (bits per occupancy byte)
    (reference ehem.py:205-208, oct_attention.py:117-124)
  * Adam + StepLR(step_size, gamma) stepped per EPOCH
    (reference oct_attention.py:101-115)
  * bf16 compute, fp32 params/optimizer state (Lightning precision='bf16')
  * checkpoint every epoch, all kept (ModelCheckpoint(save_top_k=-1));
    orbax format + archived resolved config for eval round-trip.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scp_tpu.config import Config, save_config
from scp_tpu.models import build_model


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["params", "batch_stats", "opt_state", "step"],
    meta_fields=[],
)
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any  # {} for models without BatchNorm
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(cfg, steps_per_epoch: int):
    base = float(cfg.train.lr)
    step_size = int(cfg.train.lr_scheduler.step_size)
    gamma = float(cfg.train.lr_scheduler.gamma)

    def schedule(step):
        epoch = step // steps_per_epoch
        return base * gamma ** (epoch // step_size)

    return schedule


def cross_entropy_bits(logits, labels):
    """CE / ln2 — average bits per occupancy symbol.

    Per-label selection as a one-hot masked sum: TPU lowers the per-row
    take_along_axis gather far slower than the class-width reduction
    (same finding as the codec's CDF lookups), and its backward is a
    serialized scatter where the mask's is a broadcast."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    j = jnp.arange(logp.shape[-1], dtype=labels.dtype)
    ll = jnp.sum(jnp.where(j == labels[..., None], logp, 0.0), axis=-1)
    return -jnp.mean(ll) / jnp.log(2.0)


class Trainer:
    def __init__(self, cfg: Config, steps_per_epoch: int, mesh: Mesh | None = None):
        self.cfg = cfg
        self.steps_per_epoch = steps_per_epoch
        if mesh is None:
            devs = jax.devices()
            n = cfg.get("devices") or len(devs)
            # the data axis must divide the global batch
            batch = int(cfg.data.batch_size)
            while n > 1 and batch % n:
                n -= 1
            mesh = Mesh(np.array(devs[:n]), ("data",))
        self.mesh = mesh
        dtype = jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32
        self.model = build_model(cfg, dtype=dtype)
        self.schedule = make_lr_schedule(cfg, steps_per_epoch)
        self.tx = optax.adam(self.schedule)
        self.repl = NamedSharding(mesh, P())
        self.batch_shard = NamedSharding(mesh, P("data"))
        self._train_step = None
        self._eval_step = None

    # -- init -----------------------------------------------------------

    def init_state(self, sample_batch) -> TrainState:
        rng = jax.random.PRNGKey(int(self.cfg.get("seed", 42)))
        small = {k: jnp.asarray(v[:1]) for k, v in sample_batch.items()}
        variables = self.model.init(rng, small["data"], small["pos"])
        params = variables["params"]
        consts = {k: v for k, v in variables.items() if k not in ("params", "batch_stats")}
        self._constants = consts
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))
        return jax.device_put(state, self.repl)

    # -- the jitted step --------------------------------------------------

    def _build_step(self):
        model, tx, constants = self.model, self.tx, self._constants
        drop_key = jax.random.PRNGKey(int(self.cfg.get("seed", 42)) + 1)

        def loss_fn(params, batch_stats, batch, step):
            variables = {"params": params, **constants}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(
                variables,
                batch["data"],
                batch["pos"],
                train=True,
                mutable=["batch_stats"] if batch_stats else [],
                rngs={"dropout": jax.random.fold_in(drop_key, step)},
            )
            if batch_stats:
                logits, updates = out
                new_stats = updates.get("batch_stats", batch_stats)
            else:
                logits, new_stats = (out[0] if isinstance(out, tuple) else out), batch_stats
            loss = cross_entropy_bits(logits, batch["label"])
            return loss, new_stats

        def step(state: TrainState, batch):
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, state.step
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params, new_stats, opt_state, state.step + 1),
                loss,
            )

        return jax.jit(
            step,
            in_shardings=(self.repl, self.batch_shard),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
        )

    def train_step(self, state, batch):
        from scp_tpu.train.distributed import put_global

        if self._train_step is None:
            self._train_step = self._build_step()
        batch = put_global(
            {k: np.asarray(v) for k, v in batch.items()}, self.batch_shard
        )
        return self._train_step(state, batch)

    # -- validation (held-out bits/node; the reference trains blind and
    # only discovers run quality at encode time) --------------------------

    def _build_eval_step(self):
        model, constants = self.model, self._constants

        def ev(state: TrainState, batch):
            variables = {"params": state.params, **constants}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, batch["data"], batch["pos"], train=False)
            logits = out[0] if isinstance(out, tuple) else out
            return cross_entropy_bits(logits, batch["label"])

        return jax.jit(
            ev,
            in_shardings=(self.repl, self.batch_shard),
            out_shardings=self.repl,
        )

    def evaluate(self, state, val_batches) -> float:
        """Mean held-out bits/node over a fixed batch list."""
        from scp_tpu.train.distributed import put_global

        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        total = 0.0
        for batch in val_batches:
            b = put_global(
                {k: np.asarray(v) for k, v in batch.items()}, self.batch_shard
            )
            total += float(self._eval_step(state, b))
        return total / max(len(val_batches), 1)

    # -- loop -------------------------------------------------------------

    def fit(
        self,
        dataset,
        run_dir: str,
        epochs: int | None = None,
        resume: bool = False,
        val_batches=None,
    ):
        from scp_tpu.train import checkpoints as ckpt

        cfg = self.cfg
        epochs = epochs or int(cfg.train.epoch)
        # run-dir artifacts (config, metrics, checkpoints) are written by
        # process 0 only: state is fully replicated under DP, so its copy
        # is complete, and multi-host runs often share one filesystem
        lead = jax.process_index() == 0
        os.makedirs(run_dir, exist_ok=True)
        if lead:
            save_config(cfg, run_dir)
        metrics_path = os.path.join(run_dir, "metrics.jsonl")
        if not lead:
            metrics_path = os.devnull

        from scp_tpu.train.data import prefetch

        # shape-only sample for init; the training stream is opened AFTER
        # the resume step is known so no batch is consumed off-schedule
        # (round-3 resume dropped the first prefetched batch entirely)
        state = self.init_state(next(dataset.batches()))
        start_epoch = 0
        resume_from = cfg.train.get("load_ckpt") or (
            ckpt.latest_checkpoint(run_dir) if resume else None
        )
        if resume_from:
            state, meta = ckpt.restore_state(resume_from, state)
            state = jax.device_put(state, self.repl)
            start_epoch = int(meta.get("epoch", -1)) + 1
            print(f"resumed from {resume_from} at epoch {start_epoch}")
        elif cfg.train.get("load_pretrain"):
            path = cfg.train.load_pretrain
            if str(path).endswith(".npz"):  # committed bench-ckpt format
                pre = {"params": ckpt.load_params_npz(path)["params"]}
            else:
                pre = ckpt.load(path)
                # pre-fusion checkpoints (separate q/k/v Dense scopes) must
                # migrate before filter_compatible, or every attention
                # projection silently keeps its fresh random init
                pre = {**pre, "params": ckpt.fuse_qkv_params(pre["params"])}
            state = dataclasses.replace(
                state,
                params=ckpt.filter_compatible(pre["params"], state.params),
            )
            print(f"warm-started params from {path}")

        log_every = int(cfg.train.get("log_every", 50))
        val_every = int(cfg.train.get("val_every", 500))
        step = int(state.step)
        gen = prefetch(dataset.batches(start_step=step), depth=2)
        t0 = time.time()
        wandb_run = None
        if cfg.train.get("wandb", False):
            try:  # optional: not installed in minimal images
                import wandb

                wandb_run = wandb.init(project="scp_tpu", config=cfg.to_plain())
            except Exception as e:
                print(f"wandb unavailable ({e}); logging to metrics.jsonl only")
        with open(metrics_path, "a") as mf:
            for epoch in range(start_epoch, epochs):
                for _ in range(self.steps_per_epoch):
                    state, loss = self.train_step(state, next(gen))
                    step += 1
                    if step % log_every == 0 or step == 1:
                        loss = float(loss)
                        rec = {
                            "step": step,
                            "epoch": epoch,
                            "train_loss": loss,
                            "lr": float(self.schedule(step)),
                            "wall": time.time() - t0,
                        }
                        mf.write(json.dumps(rec) + "\n")
                        if wandb_run is not None:
                            wandb_run.log(
                                {"train_loss": rec["train_loss"], "lr": rec["lr"]},
                                step=step,
                            )
                        mf.flush()
                        print(
                            f"epoch {epoch} step {step} "
                            f"loss {loss:.4f} bits/node", flush=True
                        )
                    if val_batches and val_every and step % val_every == 0:
                        val = self.evaluate(state, val_batches)
                        rec = {
                            "step": step,
                            "epoch": epoch,
                            "val_bits_per_node": val,
                            "wall": time.time() - t0,
                        }
                        mf.write(json.dumps(rec) + "\n")
                        mf.flush()
                        if wandb_run is not None:
                            wandb_run.log({"val_bits_per_node": val}, step=step)
                        print(
                            f"epoch {epoch} step {step} "
                            f"VAL {val:.4f} bits/node", flush=True
                        )
                if lead and cfg.train.get("ckpt_every_epoch", True):
                    ckpt.save(run_dir, state, self._constants, epoch=epoch, step=step)
        if lead:
            ckpt.save(
                run_dir, state, self._constants, epoch=epochs - 1, step=step,
                final=True,
            )
        return state
