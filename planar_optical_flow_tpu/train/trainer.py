"""Preemption-safe training loop over jitted train/eval steps.

Behavioral contract of the reference trainers (``src/pipeline/trainer.py``,
``src/utils/train_utils.py:70-163``), rebuilt functionally:

* per-batch: one jitted step = forward + loss + grad + clip + optimizer
  update + batch-stat update (single XLA program; the reference's
  zero_grad/backward/clip/step sequence, ``trainer.py:106-128``),
* per-iteration fractional-epoch LR schedule (inside the optimizer),
* SIGINT/SIGTERM traps flip a flag; the loop drains, writes a
  process-agnostic sigterm checkpoint and returns 1 for the scheduler to
  requeue (``trainer.py:19-21,68-75,102-104``),
* periodic epoch checkpoints and eval (``trainer.py:79-92``),
* scalar logging: TRAIN_lr / TRAIN_loss / TRAIN_epoch + task tb_dict
  (``trainer.py:122-126``).

When a mesh is provided, the step is jit-compiled with the batch sharded on
the ``data`` axis; the state is replicated by default, or partitioned by a
``state_sharding_fn`` (e.g. :func:`parallel.state_shardings` with the
Megatron-style rule on a ``(data, model)`` mesh) — the gradient all-reduce
and any tensor-parallel collectives ride ICI via XLA.
"""

from __future__ import annotations

import signal
import time

import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.train import checkpoint as ckpt_lib
from planar_optical_flow_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
    shard_batch,
)


class Trainer:
    def __init__(self, logger, cfg: dict, task, lr_schedule=None, mesh=None,
                 state_sharding_fn=None, install_signal_handlers: bool = True,
                 seed: int = 0):
        self._logger = logger
        if mesh is not None and hasattr(task, "cutout_kwargs"):
            # pallas_call carries no SPMD partitioning rule: under pjit an
            # encode_impl="auto" cutout would be REPLICATED on every chip
            # instead of sharded along the batch — resolve auto to the XLA
            # encode here (the mechanism, not just the docstring caveat).
            # An explicit "pallas" is honored as requested.
            kw = dict(task.cutout_kwargs)
            if kw.get("encode_impl", "auto") == "auto":
                import dataclasses as _dc

                kw["encode_impl"] = "xla"
                task = _dc.replace(task, cutout_kwargs=kw)
        self._task = task
        self._lr_schedule = lr_schedule
        self._mesh = mesh
        # state -> sharding pytree; used for in/out shardings + placement
        # (tensor/model-parallel); None = fully replicated state
        self._state_sharding_fn = state_sharding_fn
        self._state_shardings = None
        self._grad_norm_clip = cfg.get("grad_norm_clip", 0.0)
        # microbatch count for a pipe-axis mesh; None defaults to the
        # pipe-axis size inside pipeline_apply (so the default batch
        # requirement is batch % pipe == 0); more microbatches shrink
        # the (n_stages - 1) / (M + n_stages - 1) bubble
        self._pp_microbatches = cfg.get("pp_microbatches")
        self._ckpt_interval = cfg.get("ckpt_interval", 5)
        self._eval_interval = cfg.get("eval_interval", 5)
        self._max_epoch = cfg.get("epoch", cfg.get("epochs", 1))
        # profile steps [start, stop) into {run_dir}/profile with
        # jax.profiler (SURVEY §5 tracing row); empty tuple disables
        self._profile_steps = tuple(cfg.get("profile_steps", ()))
        # per-step global grad/param norm scalars (wandb.watch analogue)
        self._log_norms = bool(cfg.get("log_norms", True))
        # mixed-precision training: forward/backward in this dtype with f32
        # master weights + f32 optimizer state (grads come back f32 through
        # the cast); batch stats stay f32. The BATCH is deliberately not
        # cast — tasks cast the model inputs after their f32 input encoding
        # (see tasks._model_dtype), so scan geometry, targets and the loss
        # keep full precision. None/"float32" = full precision
        cd = cfg.get("compute_dtype")
        self._compute_dtype = (
            jnp.dtype(cd) if cd not in (None, "float32", "f32") else None
        )
        # "taps" = tap-concat matmul convs (same params; see
        # models.blocks.set_default_conv_impl). Process-wide default,
        # resolved when the step traces — ALWAYS set it, so a previous
        # Trainer's non-default choice cannot leak into a config that
        # didn't ask for one (sweeps construct several Trainers per
        # process).
        from planar_optical_flow_tpu.models.blocks import (
            set_default_conv_impl,
        )

        set_default_conv_impl(cfg.get("conv_impl") or "conv")
        self._rng = jax.random.PRNGKey(seed)

        self._sigterm = False
        if install_signal_handlers:
            signal.signal(signal.SIGINT, self._sigterm_cb)
            signal.signal(signal.SIGTERM, self._sigterm_cb)

        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------ plumbing

    def _sigterm_cb(self, signum, frame):
        self._sigterm = True
        self._logger.info(f"received signal {signum}; checkpointing soon")

    def request_stop(self):
        """Programmatic preemption (used by fault-injection tests)."""
        self._sigterm = True

    def _build_steps(self, state):
        task = self._task

        cdt = self._compute_dtype

        def cast_tree(tree, dtype):
            return jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                          jnp.floating)
                else a,
                tree,
            )

        # pipeline-parallel training: a mesh with a pipe axis > 1 routes
        # the loss through the task's GPipe forward (ghost-batch BN
        # policy; see tasks.loss_pipelined). The batch stays replicated —
        # microbatches flow device-to-device inside pipeline_apply's own
        # shard_map.
        pipe_n = (dict(self._mesh.shape).get("pipe", 1)
                  if self._mesh is not None else 1)
        if pipe_n > 1:
            if dict(self._mesh.shape).get("dcn", 1) > 1:
                raise ValueError(
                    "a dcn axis cannot combine with a pipe axis — the "
                    "pipeline wavefront does not span DCN (each dcn "
                    "group would redundantly run the same schedule); "
                    "use {dcn, data} or {data, pipe}"
                )
            if not hasattr(task, "loss_pipelined"):
                raise ValueError(
                    f"mesh has a pipe axis of {pipe_n} but task "
                    f"{type(task).__name__} has no loss_pipelined — use a "
                    "data/model mesh for this task"
                )
            n_stages = getattr(task, "pp_num_stages", None)
            if n_stages is not None and pipe_n != n_stages:
                raise ValueError(
                    f"mesh pipe axis is {pipe_n} but "
                    f"{type(task).__name__} stages its forward into "
                    f"{n_stages} pipeline stages — set pipeline.mesh: "
                    f"{{pipe: {n_stages}}}"
                )
            # a data axis composes: pipeline_apply shards every
            # microbatch's rows over it (dp x pp; per-shard ghost-BN
            # chains pmean-ed — see pipeline_parallel.py)
            import functools as _ft

            loss_call = _ft.partial(
                task.loss_pipelined, mesh=self._mesh,
                n_microbatches=self._pp_microbatches,
            )
        else:
            loss_call = task.loss

        def train_step(state, batch, rng):
            def loss_fn(params):
                p = cast_tree(params, cdt) if cdt is not None else params
                variables = {"params": p}
                if state.batch_stats is not None:
                    variables["batch_stats"] = (
                        cast_tree(state.batch_stats, cdt)
                        if cdt is not None else state.batch_stats
                    )
                loss, tb, _, new_stats = loss_call(
                    state.apply_fn, variables, batch, True, rng
                )
                if cdt is not None:
                    loss = loss.astype(jnp.float32)
                    new_stats = cast_tree(new_stats, jnp.float32)
                return loss, (tb, new_stats)

            (loss, (tb, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            if self._log_norms:
                # the reference's wandb.watch(model) analogue
                # (train_box_regression.py:95): global grad/param l2 norms
                gsq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                          for g in jax.tree_util.tree_leaves(grads))
                psq = sum(jnp.sum(jnp.square(p.astype(jnp.float32)))
                          for p in jax.tree_util.tree_leaves(state.params))
                tb = dict(tb, grad_norm=jnp.sqrt(gsq),
                          param_norm=jnp.sqrt(psq))
            new_state = state.apply_gradients(grads, new_stats)
            return new_state, tb

        def eval_step(state, batch):
            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            metrics, _ = task.metrics(state.apply_fn, variables, batch)
            return metrics

        if self._mesh is not None:
            rep = replicated_sharding(self._mesh)
            # a pure-pipe mesh has no data axis: the batch is replicated
            # and pipeline_apply's internal shard_map distributes stages.
            # batch_sharding spans (dcn, data) on a hybrid mesh.
            names = self._mesh.axis_names
            bs = (batch_sharding(self._mesh)
                  if ("data" in names or "dcn" in names) else rep)
            st_sh = (
                self._state_sharding_fn(self._mesh, state)
                if self._state_sharding_fn is not None else rep
            )
            self._state_shardings = st_sh
            # batch sharded on the data axis; state per the sharding rule
            # (replicated by default), scalars/rng replicated
            self._train_step = jax.jit(
                train_step, in_shardings=(st_sh, bs, rep),
                out_shardings=(st_sh, rep), donate_argnums=(0,),
            )
            self._eval_step = jax.jit(
                eval_step, in_shardings=(st_sh, bs), out_shardings=rep,
            )
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_step)

    def _place(self, batch):
        if self._mesh is not None:
            names = self._mesh.axis_names
            if "data" not in names and "dcn" not in names:
                # pure-pipe mesh: replicate (see _build_steps) — via the
                # same multi-host-safe placement as shard_batch
                from planar_optical_flow_tpu.parallel import (
                    replicate_batch,
                )

                return replicate_batch(batch, self._mesh)
            return shard_batch(batch, self._mesh)
        return batch

    def _place_state(self, state):
        if self._mesh is not None:
            sh = (self._state_shardings
                  if self._state_shardings is not None
                  else replicated_sharding(self._mesh))
            return jax.device_put(state, sh)
        return state

    # ---------------------------------------------------------------- API

    def train(self, state, train_loader, eval_loader=None):
        """Run up to ``max_epoch`` epochs. Returns (state, rc) with rc=1 on
        preemption (sigterm checkpoint written), 0 on completion."""
        if self._train_step is None:
            self._build_steps(state)
        state = self._place_state(state)

        for epoch in range(int(state.epoch), self._max_epoch):
            if self._sigterm:
                return self._preempt(state)

            t0 = time.time()
            n_batches = len(train_loader)
            epoch_loss, n_done = 0.0, 0
            for ib, batch in enumerate(train_loader):
                if self._sigterm:
                    return self._preempt(state)
                self._maybe_profile(int(state.step))
                self._rng, step_rng = jax.random.split(self._rng)
                t_step = time.time()
                state, tb = self._train_step(
                    state, self._place(batch), step_rng
                )
                step = int(state.step)
                loss = float(tb["loss"])  # blocks: host-visible step time
                self._logger.add_scalar(
                    "TRAIN_step_ms", (time.time() - t_step) * 1000.0, step
                )
                epoch_loss += loss
                n_done += 1
                if self._lr_schedule is not None:
                    self._logger.add_scalar(
                        "TRAIN_lr", float(self._lr_schedule(step)), step
                    )
                self._logger.add_scalar("TRAIN_loss", loss, step)
                self._logger.add_scalar(
                    "TRAIN_epoch", epoch + ib / max(n_batches, 1), step
                )
                for k, v in tb.items():
                    if k != "loss":
                        self._logger.add_scalar(f"TRAIN_{k}", float(v), step)

            state = state.replace(epoch=epoch + 1)
            dt = time.time() - t0
            self._logger.info(
                f"epoch {epoch}: loss {epoch_loss / max(n_done, 1):.6f} "
                f"({n_done} steps, {dt:.1f}s)"
            )

            if self._is_interval(epoch + 1, self._ckpt_interval):
                ckpt_lib.save_checkpoint(
                    f"{self._logger.ckpt_dir}/ckpt_e{epoch + 1}", state
                )
                self._logger.info(f"checkpoint ckpt_e{epoch + 1} saved")
            if eval_loader is not None and self._is_interval(
                epoch + 1, self._eval_interval
            ):
                self.evaluate(state, eval_loader, tb_prefix="VAL")
            self._logger.flush()

        return state, 0

    def evaluate(self, state, eval_loader, tb_prefix="VAL"):
        if self._eval_step is None:
            self._build_steps(state)
        sums, n = {}, 0
        for batch in eval_loader:
            if self._sigterm:
                break
            metrics = self._eval_step(state, self._place(batch))
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        means = {k: v / max(n, 1) for k, v in sums.items()}
        for k, v in means.items():
            self._logger.add_scalar(f"{tb_prefix}_{k}", v, int(state.step))
            self._logger.info(f"{tb_prefix} {k}: {v:.6f}")
        return means

    def _maybe_profile(self, step: int):
        """Start/stop a jax.profiler trace around the configured window."""
        if not self._profile_steps:
            return
        start, stop = self._profile_steps
        if step == start:
            import os

            trace_dir = os.path.join(self._logger.run_dir, "profile")
            jax.profiler.start_trace(trace_dir)
            self._logger.info(f"profiler trace started -> {trace_dir}")
        elif step == stop:
            jax.profiler.stop_trace()
            self._profile_steps = ()
            self._logger.info("profiler trace stopped")

    def _preempt(self, state):
        ckpt_lib.save_checkpoint(self._logger.sigterm_ckpt, state)
        self._logger.info(f"sigterm checkpoint saved: {self._logger.sigterm_ckpt}")
        return state, 1

    @staticmethod
    def _is_interval(epoch, interval):
        return interval > 0 and epoch % interval == 0
