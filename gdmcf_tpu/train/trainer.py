"""Training/eval orchestration — the reference ``main()`` loop, jitted.

Reference parity (``/root/reference/main.py:108-385``):
  * AdamW over all model params (ref :258)
  * per-epoch batch loop; loss = diffusion.training_losses(...).mean() (ref :346-351)
  * eval every ``eval_every`` epochs (ref :353), early stop after
    ``early_stop_patience`` epochs without a new best (ref :316-319)
  * eval iterates the TRAIN rows, masks interaction history, ranks the full
    catalog, compares against valid/test ground truth (ref :267-310)
  * model selection: valid NDCG@topN[1] compared against the running best,
    which the reference stores from the TEST result (ref :362-363) — the
    ``fidelity`` flag reproduces that quirk; otherwise valid is stored.

TPU design: one jitted train step (grads + AdamW + Lt update fused into a
single XLA program), one jitted eval step (the entire reverse-diffusion scan,
history masking, and top-k on device); the host loop only moves batches.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gdmcf_tpu.config import Config
from gdmcf_tpu.data.loader import DiffusionDataset, epoch_batches
from gdmcf_tpu.diffusion.engine import Diffusion
from gdmcf_tpu.models.registry import build_model
from gdmcf_tpu.ops.metrics import compute_topn_accuracy, print_results
from gdmcf_tpu.train.state import TrainState, create_train_state, make_optimizer, param_count


class Trainer:
    def __init__(self, cfg: Config, n_user: int, n_item: int, train_csr=None):
        self.cfg = cfg
        self.n_user = n_user
        self.n_item = n_item
        self.mesh = None
        if cfg.mesh_dp * cfg.mesh_mp > 1:
            from gdmcf_tpu.parallel.mesh import make_mesh
            devices = jax.devices()
            if jax.process_count() > 1:
                # multi-host: the mesh must cover every device (a subset
                # would leave some hosts addressing nothing), in
                # process-major order so dp blocks stay host-aligned and
                # each host's batch slice lands on its own chips
                if cfg.mesh_dp * cfg.mesh_mp != len(devices):
                    raise ValueError(
                        f"multi-host run: mesh ({cfg.mesh_dp},{cfg.mesh_mp})"
                        f" must cover all {len(devices)} devices")
                devices = sorted(devices,
                                 key=lambda d: (d.process_index, d.id))
            elif len(devices) < cfg.mesh_dp * cfg.mesh_mp:
                # dev/test convenience: virtual CPU devices stand in for a
                # slice — but never silently in production
                import warnings
                warnings.warn(
                    f"mesh ({cfg.mesh_dp},{cfg.mesh_mp}) needs "
                    f"{cfg.mesh_dp * cfg.mesh_mp} devices but only "
                    f"{len(devices)} accelerators exist; falling back to "
                    "virtual CPU devices (expect CPU-speed training)",
                    stacklevel=2)
                devices = jax.devices("cpu")
            self.mesh = make_mesh(cfg.mesh_dp, cfg.mesh_mp, devices)
        self.model = build_model(cfg, n_user, n_item, train_csr=train_csr,
                                 mesh=self.mesh)
        self.diffusion = Diffusion.create(cfg, index_in=self.model.needs_index,
                                          variant=cfg.diffusion_variant)
        self._opt_impl = cfg.resolved_opt_impl
        # decay horizon for lr schedules; fit() fills 0 in from
        # epochs x steps-per-epoch BEFORE the first (traced) step
        self._lr_total_steps = int(cfg.lr_total_steps)
        self._lr_scheduled = (cfg.lr_schedule != "constant"
                              or cfg.lr_warmup_steps > 0)
        if self._opt_impl != "optax":
            # single-pass AdamW (ops/fused_adamw.py): 'inline' (default —
            # one jnp expression per leaf, measured faster than the optax
            # chain) or 'kernel' (opt-in Pallas). Eligibility (f32 params,
            # 1-device mesh) is enforced by Config.
            self.tx = None
            self._fused_interpret = (self._opt_impl == "kernel"
                                     and jax.default_backend() != "tpu")
        else:
            # optax accepts a schedule callable; _lr_at reads the traced
            # update count (same math as the inline path)
            lr_arg = self._lr_at if self._lr_scheduled else cfg.lr
            self.tx = make_optimizer(lr_arg, cfg.weight_decay,
                                     cfg.param_dtype, cfg.opt_moment_dtype,
                                     cfg.bf16_weights)
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if cfg.rng_impl != "threefry2x32":
            jax.config.update("jax_default_prng_impl", cfg.rng_impl)
        if cfg.noise_scale == 0.0 and getattr(self.model, "needs_graph",
                                              False):
            raise ValueError(
                f"noise_scale=0 cannot serve backbone {cfg.backbone}: the "
                "degenerate reverse path has no synthetic graph to feed it "
                "(the reference crashes identically — model(x_t, t, x_tU) "
                "at gaussian_diffusion.py:699 against a forward that "
                "dereferences graph unconditionally, DNN.py:1241). Use a "
                "graph-free backbone (e.g. DNN/DNNOneHotEmbedding) for "
                "this ablation")
        if cfg.sampling_steps > cfg.steps:
            import warnings
            warnings.warn(
                f"sampling_steps ({cfg.sampling_steps}) > steps ({cfg.steps}):"
                " evaluation will fail (the reference asserts this inside "
                "p_sample, gaussian_diffusion.py:669)", stacklevel=2)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._train_multi = jax.jit(self._train_multi_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(
            self._eval_step_impl,
            static_argnames=("sampling_steps", "top_k", "shard_out"))
        self._eval_multi = jax.jit(
            self._eval_multi_impl,
            static_argnames=("sampling_steps", "top_k", "shard_out"))

    # ------------------------------------------------------------------
    def init_state(self) -> TrainState:
        state = create_train_state(self.cfg, self.model.init, tx=self.tx)
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            from gdmcf_tpu.parallel.sharding import shard_params
            params = shard_params(state.params, self.mesh)
            opt_state = self.tx.init(params)  # zeros_like inherits shardings
            state = state._replace(params=params, opt_state=opt_state)
            # Commit EVERY remaining leaf (step counter, RNG key, Lt ring,
            # opt count scalars) as mesh-replicated. Freshly-created leaves
            # are uncommitted and jit would place them fine — but an Orbax
            # RESTORE pins each leaf to its template sharding, and a
            # single-device scalar next to mesh-sharded params is an
            # incompatible-devices error on the first post-resume step
            # (multi-host fault/resume, tests/test_multihost_fault.py).
            rep = NamedSharding(self.mesh, P())
            multiproc = jax.process_count() > 1

            def commit(leaf):
                sh = getattr(leaf, "sharding", None)
                if isinstance(sh, NamedSharding) and sh.mesh == self.mesh:
                    return leaf
                if multiproc:
                    host = np.asarray(leaf)
                    return jax.make_array_from_process_local_data(
                        rep, host, host.shape)
                return jax.device_put(leaf, rep)

            state = jax.tree_util.tree_map(commit, state)
        return state

    def _put_batch(self, x: jnp.ndarray, idx: jnp.ndarray,
                   replicate: bool = False):
        """``replicate=True`` (multi-host): every process passes the
        identical full batch and gets a replicated global array — used for
        eval batches that cannot dp-shard (non-divisible partials, or
        ``eval_replicated=True``). Everything else — train batches and the
        default dp-sharded eval batches — is per-process shards assembled
        into the global dp batch."""
        if self.mesh is None:
            return jnp.asarray(x), jnp.asarray(idx)
        from jax.sharding import NamedSharding
        from gdmcf_tpu.parallel.sharding import compatible_spec
        from jax.sharding import PartitionSpec as P
        if jax.process_count() > 1:
            if replicate:
                x, idx = np.asarray(x), np.asarray(idx)
                rep = NamedSharding(self.mesh, P())
                return (jax.make_array_from_process_local_data(rep, x, x.shape),
                        jax.make_array_from_process_local_data(rep, idx,
                                                               idx.shape))
            return self._put_batch_multihost(x, idx)
        x = jnp.asarray(x)
        idx = jnp.asarray(idx)
        xs = compatible_spec(P("dp", "mp"), x.shape, self.mesh)
        is_ = compatible_spec(P("dp"), idx.shape, self.mesh)
        return (jax.device_put(x, NamedSharding(self.mesh, xs)),
                jax.device_put(idx, NamedSharding(self.mesh, is_)))

    def _put_batch_multihost(self, x, idx):
        """Multi-host feed: ``x``/``idx`` are THIS process's local batch rows
        (each host loads a disjoint user shard — see
        parallel.multihost.local_row_range). The global batch is the
        concatenation over processes along the dp axis; plain device_put
        cannot place onto non-addressable devices, so the global array is
        assembled from per-process shards."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        from gdmcf_tpu.parallel.sharding import compatible_spec
        x = np.asarray(x)
        idx = np.asarray(idx)
        nproc = jax.process_count()
        gx_shape = (x.shape[0] * nproc,) + x.shape[1:]
        gi_shape = (idx.shape[0] * nproc,) + idx.shape[1:]
        dp = int(dict(self.mesh.shape).get("dp", 1))
        if gx_shape[0] % dp or dp % nproc:
            # compatible_spec would silently DROP the dp axis, and a
            # replicated spec demands the full global array from every
            # process — fail with the actual contract instead
            raise ValueError(
                f"global batch dim {gx_shape[0]} (local {x.shape[0]} x "
                f"{nproc} processes) must divide evenly over mesh dp={dp}, "
                f"and dp must be a multiple of the process count")
        xs = compatible_spec(P("dp", "mp"), gx_shape, self.mesh)
        is_ = compatible_spec(P("dp"), gi_shape, self.mesh)
        return (jax.make_array_from_process_local_data(
                    NamedSharding(self.mesh, xs), x, gx_shape),
                jax.make_array_from_process_local_data(
                    NamedSharding(self.mesh, is_), idx, gi_shape))

    def _eval_shardable(self, b: int) -> bool:
        """True when a size-``b`` eval batch dp-shards across hosts (each
        host scores its 1/nproc user slice; metric sums reduce bit-exactly
        at the end) instead of every host redundantly scoring all rows."""
        if self.mesh is None or jax.process_count() <= 1:
            return False
        if self.cfg.eval_replicated:
            return False
        nproc = jax.process_count()
        dp = int(dict(self.mesh.shape).get("dp", 1))
        return b % nproc == 0 and b % dp == 0 and dp % nproc == 0

    @staticmethod
    def _local_blocks(out, batch_axis: int):
        """Yield ``(row_slice, np_block)`` for this host's deduped
        addressable blocks of a dp-sharded eval output. ``row_slice``
        indexes the batch axis in global-batch coordinates (blocks are
        replicated across the mp axis — one copy per index is yielded)."""
        seen = set()
        for s in out.addressable_shards:
            sl = s.index[batch_axis]
            start = sl.start or 0
            stop = sl.stop if sl.stop is not None else out.shape[batch_axis]
            if (start, stop) in seen:
                continue
            seen.add((start, stop))
            yield slice(start, stop), np.asarray(jax.device_get(s.data))

    def _acc_local_blocks(self, acc, uids_devs, preds, gt_fn) -> None:
        """Accumulate this host's dp blocks of a sharded eval output into
        ``acc``. ``uids_devs``: the per-batch [B] uids device arrays (K of
        them for a fused [K, B, k] ``preds``, one for a plain [B, k]). The
        row->user mapping comes from the uids arrays' OWN blocks, paired
        with the pred blocks by shard row range: uids and preds share the
        dp partitioning of the batch axis, so the pairing holds even on
        meshes whose dp blocks are not process-contiguous (e.g. a TPU slice
        whose raw device order interleaves hosts) — positional
        ``start + process_index*lb`` math would silently score the wrong
        ground-truth rows there."""
        fused = preds.ndim == 3
        axis = 1 if fused else 0
        uid_maps = [{(sl.start, sl.stop): blk
                     for sl, blk in self._local_blocks(u, 0)}
                    for u in uids_devs]
        for sl, pred in self._local_blocks(preds, axis):
            key = (sl.start, sl.stop)
            if fused:
                for j in range(pred.shape[0]):
                    acc.add(gt_fn(uid_maps[j][key]), pred[j])
            else:
                acc.add(gt_fn(uid_maps[0][key]), pred)

    def _local_eval_slice(self, start: int, b: int):
        """This host's (offset, length) slice of a size-``b`` sharded eval
        batch starting at global row ``start``. Any disjoint per-host
        partition works — the uids ride the batch, and accumulation maps
        rows back through them (_acc_local_blocks)."""
        lb = b // jax.process_count()
        return start + jax.process_index() * lb, lb

    @staticmethod
    def _reduce_metric_acc(acc):
        """Sum a MetricAccumulator across hosts (bit-exact f64 byte
        transport) and return the global result. Collective — every host
        must call it after accumulating its disjoint share."""
        from gdmcf_tpu.parallel.multihost import allgather_host_vectors
        acc._drain()  # fold any deferred on-device batch sums into .sums
        payload = np.concatenate([acc.sums.ravel(),
                                  np.asarray([acc.n_users], np.float64)])
        total = allgather_host_vectors(payload).sum(axis=0)
        acc.sums = total[:-1].reshape(acc.sums.shape)
        acc.n_users = int(round(total[-1]))
        return acc.result()

    def num_params(self, state: TrainState) -> int:
        return param_count(state.params)

    def _lr_at(self, step):
        """Learning rate at a (traced) optimizer-step count: linear warmup
        over ``lr_warmup_steps``, then cosine/linear decay spanning
        ``lr_total_steps``. Pure scalar jnp math — XLA fuses it into the
        update, so schedules cost nothing on-chip."""
        cfg = self.cfg
        if not self._lr_scheduled:
            return cfg.lr
        s = jnp.asarray(step, jnp.float32)
        lr = jnp.float32(cfg.lr)
        if cfg.lr_warmup_steps > 0:
            lr = lr * jnp.minimum((s + 1.0) / cfg.lr_warmup_steps, 1.0)
        if cfg.lr_schedule != "constant" and self._lr_total_steps > 0:
            frac = jnp.clip(s / self._lr_total_steps, 0.0, 1.0)
            if cfg.lr_schedule == "cosine":
                lr = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
            else:  # linear
                lr = lr * (1.0 - frac)
        return lr

    def _matmul_precision(self):
        """compute_dtype='bfloat16' -> fast single-pass MXU (DEFAULT);
        'float32' -> 3-pass f32-equivalent precision ('float32')."""
        return ("default" if self.cfg.compute_dtype == "bfloat16"
                else "float32")

    # ------------------------------------------------------------------
    def _train_step_impl(self, state: TrainState, x: jnp.ndarray,
                         index: jnp.ndarray):
        if x.dtype == jnp.uint8:
            # bit-packed wire format (ops/bitpack.py): unpack inside the
            # compiled program so the [B, n_item] f32 tensor exists only as
            # an XLA fusion input, never as a host->device transfer
            from gdmcf_tpu.ops.bitpack import unpack_rows
            self._check_packed_width(x)
            x = unpack_rows(x, self.n_item)
        if self.cfg.OneHotMatrix == 1 and x.shape[-1] == self.n_item:
            # block one-hot INSIDE the program (mirrors _eval_step_body):
            # host-side assembly would block-onehot each process's LOCAL
            # slice on multi-host, concatenating per-process blocks instead
            # of building the block of the global batch. Pre-onehot'd
            # callers are detected by shape ([B+n, B+n] last dim != n_item).
            x = self._to_block_onehot(x)
        key, step_key = jax.random.split(state.key)

        def loss_fn(params):
            loss_vec, new_lt, aux = self.diffusion.training_losses(
                self.model.apply, params, x, index, step_key, state.lt,
                reweight=self.cfg.reweight, train=True)
            return loss_vec.mean(), (new_lt, aux)

        with jax.default_matmul_precision(self._matmul_precision()):
            (loss, (new_lt, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        if self.cfg.grad_clip_norm > 0.0:
            # global-norm clip, uniform across optimizer paths (scalar math
            # fused into the update by XLA)
            gn = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                              for g in jax.tree_util.tree_leaves(grads)))
            scale = jnp.minimum(1.0, self.cfg.grad_clip_norm
                                / jnp.maximum(gn, 1e-12))
            grads = jax.tree_util.tree_map(
                lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype),
                grads)
        if self.tx is None:
            from gdmcf_tpu.ops.fused_adamw import fused_adamw_apply
            from gdmcf_tpu.train.state import _trainable_mask
            new_params, new_opt = fused_adamw_apply(
                state.params, grads, state.opt_state,
                _trainable_mask(state.params),
                lr=self._lr_at(state.step),
                weight_decay=self.cfg.weight_decay,
                impl=self._opt_impl, interpret=self._fused_interpret)
        else:
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            # dtype-preserving apply: with param_dtype=bfloat16 the update
            # is (f32 master delta); add in f32, store in the params' dtype
            new_params = jax.tree_util.tree_map(
                lambda p, u: (p.astype(u.dtype) + u).astype(p.dtype),
                state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt, lt=new_lt, key=key)
        return new_state, loss

    def _train_multi_impl(self, state: TrainState, xs: jnp.ndarray,
                          idxs: jnp.ndarray):
        """K fused optimizer steps (xs: [K, B, n], idxs: [K, B]) — exactly
        the math of K sequential _train_step calls (same RNG split chain),
        in one compiled program."""

        def body(st, inp):
            x, idx = inp
            return self._train_step_impl(st, x, idx)

        # measured: partial unroll is a regression here (287k vs 312k
        # examples/s at k=20) — XLA already keeps the scan carry in place
        state, losses = jax.lax.scan(body, state, (xs, idxs))
        return state, losses

    def _check_packed_width(self, x: jnp.ndarray) -> None:
        """uint8 inputs are IN-BAND packed batches; fail loudly if the shape
        says otherwise (e.g. a caller passing genuine uint8 dense rows, which
        unpack_rows would silently reinterpret as bit-flags)."""
        want = (self.n_item + 7) // 8
        if x.shape[-1] != want:
            raise ValueError(
                f"uint8 batch last dim {x.shape[-1]} != ceil(n_item/8)="
                f"{want}: uint8 means the bit-packed wire format "
                "(ops/bitpack.pack_rows). For dense rows use float32, or "
                "pack them.")

    @staticmethod
    def _to_block_onehot(x: jnp.ndarray) -> jnp.ndarray:
        """OneHotMatrix==1 mode: [B, n] adjacency -> [B+n, B+n] block matrix
        (ref adjacency_to_one_hot, main.py:36-68) as one static-shape op."""
        b, n = x.shape
        y = jnp.zeros((b + n, b + n), dtype=x.dtype)
        return y.at[:b, b:].set(x)

    def train_epoch(self, state: TrainState, dataset: DiffusionDataset,
                    rng: np.random.Generator):
        # losses stay on device until the epoch ends: a float() per batch
        # would synchronize every step (25 ms dispatch RTT on the dev tunnel)
        losses = []
        k = max(self.cfg.train_steps_per_call, 1)
        pending = []
        bs = self.cfg.batch_size
        offset = 0
        nproc = jax.process_count()
        multihost = self.mesh is not None and nproc > 1
        if multihost:
            # multi-host: each process trains on its disjoint user shard
            # with the LOCAL slice of the global batch; _put_batch assembles
            # the global dp batch from the per-process shards
            from gdmcf_tpu.data.loader import RowSlice
            from gdmcf_tpu.parallel.multihost import local_row_range
            if bs % nproc:
                raise ValueError(f"batch_size {bs} must divide evenly over "
                                 f"{nproc} processes")
            dp = int(dict(self.mesh.shape).get("dp", 1))
            if dp % nproc or bs % dp:
                raise ValueError(
                    f"multi-host feed needs mesh dp ({dp}) to be a multiple "
                    f"of process_count ({nproc}) and batch_size ({bs}) to "
                    f"divide evenly over dp: each host contributes a "
                    "contiguous 1/nproc slice of the dp-sharded global batch")
            rows = local_row_range(len(dataset))
            dataset = RowSlice(dataset, rows)
            offset = rows.start
            bs //= nproc
            if len(dataset) < bs:
                raise ValueError(
                    f"local shard has {len(dataset)} rows < local batch size "
                    f"{bs}: no full global batch can be assembled (reduce "
                    "batch_size or host count)")
        pack = (self.cfg.wire_format == "packed"
                and getattr(dataset, "binary", False))
        from gdmcf_tpu.data.prefetch import prefetched
        batches = prefetched(
            # multi-host always drops the trailing partial batch: a partial
            # global batch is usually not dp-divisible and every host must
            # run the same number of collective steps
            epoch_batches(dataset, bs, rng,
                          shuffle=self.cfg.shuffle,
                          drop_last=self.cfg.drop_last or multihost,
                          packed=pack),
            depth=self.cfg.prefetch_batches)
        for x, idx in batches:
            # packed batches ship as bits; _train_step_impl unpacks (and
            # block-onehots) inside the compiled program. x stays a host
            # array until _put_batch places it (converting earlier would
            # cost a device->host round trip on the multi-host path)
            if offset:
                idx = idx + np.int32(offset)  # slice position -> global id
            placed = self._put_batch(x, idx)
            if k > 1 and pending and placed[0].shape != pending[0][0].shape:
                # trailing partial batch (drop_last=False): it cannot stack
                # into the k-group — jnp.stack over mixed shapes raises and
                # kills the epoch when ceil(n/bs) % k == 0. Drain the
                # equal-shape pending as single steps (the same path the
                # post-loop remainder takes) and let the partial follow.
                for xp, ip in pending:
                    state, l = self._train_step(state, xp, ip)
                    losses.append(l)
                pending.clear()
            pending.append(placed)
            if k > 1 and len(pending) == k:
                xs = jnp.stack([p[0] for p in pending])
                iis = jnp.stack([p[1] for p in pending])
                pending.clear()
                state, ls = self._train_multi(state, xs, iis)
                losses.append(ls.sum())
            elif k == 1:
                (x, idx), = pending
                pending.clear()
                state, l = self._train_step(state, x, idx)
                losses.append(l)
        # remainder (fewer than k batches) runs as single steps
        for x, idx in pending:
            state, l = self._train_step(state, x, idx)
            losses.append(l)
        total_loss = float(jnp.stack(losses).sum()) if losses else 0.0
        return state, total_loss

    # ------------------------------------------------------------------
    def _eval_step_impl(self, params, x, index, mask, key,
                        sampling_steps: int, top_k: int,
                        shard_out: bool = False):
        """p_sample -> mask seen items -> device top-k (ref main.py:288-305)."""
        # bit-packed payloads (ops/bitpack.py; serve ships 32x less wire per
        # recommend() chunk, eval caches hold 32x less HBM)
        from gdmcf_tpu.ops.bitpack import unpack_rows
        if x.dtype == jnp.uint8:
            self._check_packed_width(x)
            x = unpack_rows(x, self.n_item)
        if mask.dtype == jnp.uint8:
            self._check_packed_width(mask)
            mask = unpack_rows(mask, self.n_item)
        with jax.default_matmul_precision(self._matmul_precision()):
            out = self._eval_step_body(params, x, index, mask, key,
                                       sampling_steps, top_k)
        if self.mesh is not None and jax.process_count() > 1:
            # shard_out=True: dp-sharded eval — each host reads only its
            # addressable row blocks (_local_blocks) and accumulates metrics
            # for them. shard_out=False: replicated eval — pin the output
            # replicated so every host can read the full result.
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = P("dp") if shard_out else P()
            out = jax.lax.with_sharding_constraint(
                out, NamedSharding(self.mesh, spec))
        return out

    def _eval_step_body(self, params, x, index, mask, key,
                        sampling_steps: int, top_k: int):
        if self.cfg.OneHotMatrix == 1:
            b = x.shape[0]
            scores_full = self.diffusion.p_sample(
                self.model.apply, params, self._to_block_onehot(x), index, key,
                sampling_steps=sampling_steps,
                sampling_noise=self.cfg.sampling_noise)
            # threshold + block extraction (ref main.py:291-295)
            scores_full = jnp.where(scores_full <= 0.1, 0.0, scores_full)
            scores = scores_full[:b, b:]
        else:
            scores = self.diffusion.p_sample(
                self.model.apply, params, x, index, key,
                sampling_steps=sampling_steps,
                sampling_noise=self.cfg.sampling_noise)
        scores = jnp.where(mask > 0, -jnp.inf, scores)
        if (self.mesh is not None and self.cfg.mesh_mp > 1
                and scores.shape[1] // self.cfg.mesh_mp >= top_k):
            # shard-local top-k + k-merge: only [B, k] crosses the ICI.
            # Non-divisible shapes are padded with -inf (extra catalog
            # columns AND batch rows; padded rows are sliced off below)
            # instead of silently all-gathering the full matrix.
            from gdmcf_tpu.ops.topk import sharded_topk
            b, n = scores.shape
            pad_n = (-n) % self.cfg.mesh_mp
            pad_b = (-b) % self.cfg.mesh_dp
            padded = jnp.pad(scores, ((0, pad_b), (0, pad_n)),
                             constant_values=-jnp.inf)
            _, idx = sharded_topk(self.mesh, padded, top_k)
            # padded columns can only win for all--inf rows; keep ids in-range
            idx = jnp.minimum(idx[:b], n - 1)
        else:
            # exact chunked two-stage select — ~30% over one lax.top_k at
            # eval geometry (benchmarks/profile_topk.py)
            from gdmcf_tpu.ops.topk import chunked_topk
            _, idx = chunked_topk(scores, top_k)
        return idx

    def _eval_multi_impl(self, params, xs, idxs, masks, keys,
                         sampling_steps: int, top_k: int,
                         shard_out: bool = False):
        """K eval batches fused into one program (lax.scan over stacked
        batches) — same math as K _eval_step calls, K-fold fewer dispatches.
        The large-catalog eval loop (e.g. 97 batches at the 100k-user
        geometry) pays one launch instead of 97."""

        def body(_, inp):
            x, idx, mask, key = inp
            out = self._eval_step_impl(params, x, idx, mask, key,
                                       sampling_steps, top_k,
                                       shard_out=shard_out)
            return None, out

        _, idx = jax.lax.scan(body, None, (xs, idxs, masks, keys))
        return idx

    def evaluate(self, state: TrainState, eval_rows: np.ndarray,
                 gt_matrix: np.ndarray, mask_matrix: np.ndarray,
                 topn, key: Optional[jax.Array] = None,
                 drop_last: Optional[bool] = None):
        """Rank the catalog for each eval row and compute Precision/Recall/NDCG/MRR.

        eval_rows: the model inputs (train interaction rows, ref main.py:156)
        gt_matrix: ground-truth split (valid or test)
        mask_matrix: history to exclude (train, or train+valid for test)
        drop_last: None = cfg.drop_last. fit() passes False for the
        tst_w_val test eval — the reference's test_twv_loader is the one
        loader built WITHOUT drop_last (ref main.py:176), so it scores the
        trailing partial batch while the others drop it.
        """
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(cfg.random_seed + 12345)
        cached = self._prepare_eval_batches(eval_rows, mask_matrix,
                                            drop_last=drop_last)
        all_idx = []
        kept_users = []
        top_k = int(max(topn))  # unsorted topN still ranks enough items
        # dp-sharded multi-host eval: each host accumulates metric sums for
        # its own row blocks only; the sums reduce across hosts at the end.
        # Replicated batches (e.g. a non-divisible trailing partial) are
        # counted once, by the main process.
        use_acc = any(c[4] for c in cached)
        if use_acc:
            from gdmcf_tpu.ops.metrics import MetricAccumulator
            from gdmcf_tpu.parallel.multihost import is_main_process
            acc = MetricAccumulator(topn)
        # single-process path: metric sums accumulate ON-DEVICE against a
        # bit-packed device-resident GT cache — the [B, top_k] rankings
        # never leave the chip and the GT ships once per run, not 67 MB per
        # eval (the measured bulk of the 1.75 s eval-epoch wall on the
        # relay; docs/BENCH_NOTES.md epoch-wall table)
        gt_dev = None if use_acc else self._prepare_gt_batches(
            gt_matrix, cached, eval_rows, mask_matrix, drop_last)
        sums_dev = []
        n_users_seen = 0
        # one key per batch, split in batch order — identical results whether
        # batches run singly or fused (tested)
        subs = []
        for _ in cached:
            key, sub = jax.random.split(key)
            subs.append(sub)
        k_fuse = max(getattr(cfg, "eval_batches_per_call", 1), 1)
        i = 0
        while i < len(cached):
            group = cached[i:i + k_fuse]
            # fuse the equal-shape, same-placement PREFIX of the window (a
            # trailing partial batch only trims the group, it doesn't
            # un-fuse the full ones)
            n_eq = 1
            while (n_eq < len(group)
                   and group[n_eq][1].shape == group[0][1].shape
                   and group[n_eq][4] == group[0][4]):
                n_eq += 1
            group = group[:n_eq]
            sharded = group[0][4]
            if k_fuse > 1 and len(group) > 1:
                xs = jnp.stack([g[1] for g in group])
                us = jnp.stack([g[2] for g in group])
                ms = jnp.stack([g[3] for g in group])
                ks = jnp.stack(subs[i:i + len(group)])
                idx = self._eval_multi(state.params, xs, us, ms, ks,
                                       sampling_steps=cfg.sampling_steps,
                                       top_k=top_k, shard_out=sharded)
                if sharded:
                    self._acc_local_blocks(acc, [g[2] for g in group], idx,
                                           lambda u: gt_matrix[u])
                elif gt_dev is not None:
                    from gdmcf_tpu.ops.metrics import packed_batch_metric_sums
                    gts = jnp.stack([gt_dev[i + j]
                                     for j in range(len(group))])
                    sums_dev.append(packed_batch_metric_sums(
                        gts, idx, self.n_item, tuple(topn)))
                    n_users_seen += sum(g[1].shape[0] for g in group)
                else:
                    for j, (start, rows, *_r) in enumerate(group):
                        users = np.arange(start, start + rows.shape[0])
                        if use_acc:
                            if is_main_process():
                                acc.add(gt_matrix[users], np.asarray(idx[j]))
                        else:
                            all_idx.append(np.asarray(idx[j]))
                            kept_users.append(users)
                i += len(group)
            else:
                start, rows, uids, mask, _s = cached[i]
                idx = self._eval_step(state.params, rows, uids, mask, subs[i],
                                      sampling_steps=cfg.sampling_steps,
                                      top_k=top_k, shard_out=sharded)
                if sharded:
                    self._acc_local_blocks(acc, [uids], idx,
                                           lambda u: gt_matrix[u])
                elif gt_dev is not None:
                    from gdmcf_tpu.ops.metrics import packed_batch_metric_sums
                    sums_dev.append(packed_batch_metric_sums(
                        gt_dev[i], idx, self.n_item, tuple(topn)))
                    n_users_seen += rows.shape[0]
                else:
                    users = np.arange(start, start + rows.shape[0])
                    if use_acc:
                        if is_main_process():
                            acc.add(gt_matrix[users], np.asarray(idx))
                    else:
                        all_idx.append(np.asarray(idx))
                        kept_users.append(users)
                i += 1
        if use_acc:
            return self._reduce_metric_acc(acc)
        if gt_dev is not None:
            # ONE device->host fetch for the whole eval; combine in f64
            total = np.zeros((4, len(topn)), dtype=np.float64)
            for s in sums_dev:
                a = np.asarray(s, dtype=np.float64)
                total += a.sum(axis=0) if a.ndim == 3 else a
            out = total / max(n_users_seen, 1)
            rnd = lambda row: [round(float(v), 4) for v in row]  # noqa: E731
            return rnd(out[0]), rnd(out[1]), rnd(out[2]), rnd(out[3])
        pred = np.concatenate(all_idx, axis=0)
        users = np.concatenate(kept_users)
        return compute_topn_accuracy(gt_matrix[users], pred, topn)

    def _prepare_gt_batches(self, gt_matrix, cached, eval_rows, mask_matrix,
                            drop_last):
        """Per-eval-batch BIT-PACKED ground-truth slices, device-resident
        and cached across eval epochs (GT is constant during training).
        Aligned 1:1 with ``_prepare_eval_batches``'s entries via each
        entry's (start, rows). Returns None when GT rows are non-binary
        (count-valued datasets keep the host path)."""
        cache = getattr(self, "_gt_cache", None)
        if cache is None:
            cache = self._gt_cache = []
        drop = self.cfg.drop_last if drop_last is None else drop_last
        for key_tuple, dev in cache:
            if (key_tuple[0] is gt_matrix and key_tuple[1] is eval_rows
                    and key_tuple[2] is mask_matrix
                    and key_tuple[3] == self.cfg.batch_size
                    and key_tuple[4] == drop):
                return dev
        # binary check only on a cache MISS: min/max are two full passes
        # over the dense [n_user, n_item] GT — at large geometry that host
        # scan per evaluate() call rivals the whole on-device eval epoch
        # (a miss stores either the batches or the non-binary verdict)
        gmin = gt_matrix.min() if gt_matrix.size else 0
        gmax = gt_matrix.max() if gt_matrix.size else 0
        if not (0 <= gmin and gmax <= 1):
            if len(cache) >= 4:
                cache.pop(0)
            cache.append(((gt_matrix, eval_rows, mask_matrix,
                           self.cfg.batch_size, drop), None))
            return None
        from gdmcf_tpu.ops.bitpack import pack_rows
        dev = []
        for start, rows, *_r in cached:
            sl = np.asarray(gt_matrix[start:start + rows.shape[0]]) > 0
            dev.append(jnp.asarray(pack_rows(sl)))
        if len(cache) >= 4:  # bound device memory, like _prepare_eval_batches
            cache.pop(0)
        cache.append(((gt_matrix, eval_rows, mask_matrix,
                       self.cfg.batch_size, drop), dev))
        return dev

    def _prepare_eval_batches(self, eval_rows: np.ndarray,
                              mask_matrix: np.ndarray,
                              drop_last: Optional[bool] = None):
        """Device-resident eval batches, cached across eval epochs: the rows
        and masks are constant during training, so uploading them once saves
        ~(2 x dataset size) of host->device transfer per eval.

        Cache entries hold references to the source arrays and are matched
        with ``is`` — never ``id()`` of a possibly-collected temporary, whose
        address a different same-shape array could recycle (stale batches)."""
        drop = self.cfg.drop_last if drop_last is None else drop_last
        cache = getattr(self, "_eval_cache", None)
        if cache is None:
            cache = self._eval_cache = []
        for rows_ref, mask_ref, bs_key, drop_key, batches in cache:
            if (rows_ref is eval_rows and mask_ref is mask_matrix
                    and bs_key == self.cfg.batch_size and drop_key == drop):
                return batches
        cfg = self.cfg
        n = eval_rows.shape[0]
        bs = cfg.batch_size
        from gdmcf_tpu.data.loader import epoch_stop
        stop = epoch_stop(n, bs, drop)
        from gdmcf_tpu.ops.bitpack import is_binary

        # cache bit-packed when possible: 32x less HBM held across training
        # and 32x less one-time upload (_eval_step unpacks in-program)
        pack = (cfg.wire_format == "packed" and is_binary(eval_rows)
                and is_binary(mask_matrix))
        if pack:
            from gdmcf_tpu.ops.bitpack import pack_rows
        batches = []
        for start in range(0, stop, bs):
            b = min(bs, stop - start)
            sharded = self._eval_shardable(b)
            if sharded:
                # dp-sharded multi-host batch: this host uploads only its
                # 1/nproc slice; _put_batch assembles the global dp batch
                lo, lb = self._local_eval_slice(start, b)
                rows_np = eval_rows[lo:lo + lb]
                mask_np = mask_matrix[lo:lo + lb]
                uids_np = np.arange(lo, lo + lb, dtype=np.int32)
            else:
                rows_np = eval_rows[start:start + bs]
                mask_np = mask_matrix[start:start + rows_np.shape[0]]
                uids_np = np.arange(start, start + rows_np.shape[0],
                                    dtype=np.int32)
            if pack:
                rows_np, mask_np = pack_rows(rows_np), pack_rows(mask_np)
            # host arrays go straight to _put_batch (an early jnp.asarray
            # would cost a device->host round trip on the multi-host path);
            # the second put reuses the HOST uids for the same reason
            rows, uids = self._put_batch(rows_np, uids_np,
                                         replicate=not sharded)
            if mask_matrix is eval_rows:
                # the train-rows evals (valid + tst_w_val test) mask with
                # the SAME array they score — reuse the device rows rather
                # than uploading and holding an identical copy (halves the
                # cached HBM at dense large-catalog geometries)
                mask = rows
            else:
                mask, _ = self._put_batch(mask_np, uids_np,
                                          replicate=not sharded)
            batches.append((start, rows, uids, mask, sharded))
        if len(cache) >= 4:  # bound device-memory held by cached splits
            cache.pop(0)
        cache.append((eval_rows, mask_matrix, cfg.batch_size, drop, batches))
        return batches

    def evaluate_streaming(self, state: TrainState, input_csrs, gt_csr,
                           mask_csrs, topn, key=None,
                           drop_last: Optional[bool] = None):
        """Large-catalog eval: batches assembled from NativeCSR (O(nnz) host
        memory), metrics streamed through MetricAccumulator — nothing dense
        of size [n_user, n_item] ever materializes on the host.

        input_csrs / mask_csrs: lists of NativeCSR whose per-row union forms
        the model input / history mask (e.g. [train] or [train, valid]).
        """
        from gdmcf_tpu.ops.metrics import MetricAccumulator

        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(cfg.random_seed + 12345)
        n = len(input_csrs[0])
        bs = cfg.batch_size
        drop = cfg.drop_last if drop_last is None else drop_last
        from gdmcf_tpu.data.loader import epoch_stop
        stop = epoch_stop(n, bs, drop)
        acc = MetricAccumulator(topn)
        top_k = int(max(topn))  # unsorted topN still ranks enough items
        starts = list(range(0, stop, bs))
        # dp-sharded multi-host eval (see _eval_shardable): each host scores
        # and accumulates 1/nproc of every shardable batch; non-shardable
        # batches (a non-divisible trailing partial) run replicated and are
        # counted once, by the main process; sums reduce at the end.
        use_reduce = any(self._eval_shardable(min(s + bs, n) - s)
                         for s in starts)
        if use_reduce:
            from gdmcf_tpu.parallel.multihost import is_main_process

        def union(csrs, idx):
            out = csrs[0].gather(idx)
            for c in csrs[1:]:
                out = np.clip(out + c.gather(idx), 0.0, 1.0)
            return out

        k_fuse = max(getattr(cfg, "eval_batches_per_call", 1), 1)
        # (gt, start, rows, uids, mask, sub, sharded); gt is None for
        # sharded entries — gathered per local block at accumulation time
        pending = []

        def flush():
            if not pending:
                return
            sharded = pending[0][6]
            if len(pending) == 1:
                gt, start, rows, uids, mask, sub, _ = pending[0]
                pred = self._eval_step(state.params, rows, uids, mask, sub,
                                       sampling_steps=cfg.sampling_steps,
                                       top_k=top_k, shard_out=sharded)
                if sharded:
                    self._acc_local_blocks(acc, [uids], pred,
                                           lambda u: gt_csr.gather(u))
                elif not use_reduce or is_main_process():
                    if hasattr(gt_csr, "gather_packed"):
                        acc.add_packed(gt, pred, self.n_item)
                    else:
                        acc.add(gt, np.asarray(pred))
            else:
                xs = jnp.stack([p[2] for p in pending])
                us = jnp.stack([p[3] for p in pending])
                ms = jnp.stack([p[4] for p in pending])
                ks = jnp.stack([p[5] for p in pending])
                preds = self._eval_multi(state.params, xs, us, ms, ks,
                                         sampling_steps=cfg.sampling_steps,
                                         top_k=top_k, shard_out=sharded)
                if sharded:
                    self._acc_local_blocks(acc, [p[3] for p in pending],
                                           preds, lambda u: gt_csr.gather(u))
                else:
                    for j, p in enumerate(pending):
                        if not use_reduce or is_main_process():
                            if hasattr(gt_csr, "gather_packed"):
                                acc.add_packed(p[0], preds[j], self.n_item)
                            else:
                                acc.add(p[0], np.asarray(preds[j]))
            pending.clear()

        pack = cfg.wire_format == "packed"
        if pack:
            from gdmcf_tpu.ops.bitpack import pack_rows
        for start in starts:
            idx = np.arange(start, min(start + bs, n), dtype=np.int32)
            sharded = self._eval_shardable(idx.size)
            gt = None
            if sharded:
                # this host gathers, packs and ships only its user slice —
                # host-side assembly work also divides by nproc
                lo, lb = self._local_eval_slice(start, idx.size)
                idx = np.arange(lo, lo + lb, dtype=np.int32)
            else:
                # bit-packed GT transport + on-device sums: the dense
                # [B, n_item] GT rows were the streaming eval's largest
                # per-batch transfer (0.5 GB/batch at a 131k catalog)
                gt = (gt_csr.gather_packed(idx)
                      if hasattr(gt_csr, "gather_packed")
                      else gt_csr.gather(idx))
            rows = union(input_csrs, idx)
            mask = union(mask_csrs, idx)
            if pack:  # union() output is binary (clipped); ship bits
                rows, mask = pack_rows(rows), pack_rows(mask)
            rows, uids = self._put_batch(rows, idx, replicate=not sharded)
            mask, _ = self._put_batch(mask, idx, replicate=not sharded)
            key, sub = jax.random.split(key)
            if pending and (pending[0][2].shape != rows.shape
                            or pending[0][6] != sharded):
                flush()  # trailing partial batch runs alone
            pending.append((gt, start, rows, uids, mask, sub, sharded))
            if len(pending) == k_fuse:
                flush()
        flush()
        if use_reduce:
            return self._reduce_metric_acc(acc)
        return acc.result()

    # ------------------------------------------------------------------
    def fit(self, train_csr, valid_csr, test_csr, log=print,
            checkpointer=None, metric_logger=None):
        cfg = self.cfg
        n_rows = cfg.n_user_cap or train_csr.shape[0]

        def dense_rows(csr):
            # slice -> astype -> toarray: peak memory O(n_rows x n_item)
            # f32. todense() on the full CSR first would materialize
            # [n_user, n_item] float64 (data_load's sums build f64) BEFORE
            # the cap applies — defeating n_user_cap's purpose (same order
            # as DiffusionDataset.__init__, data/loader.py)
            return csr[:n_rows].astype(np.float32).toarray()

        if cfg.host_dense:
            train_rows = dense_rows(train_csr)
            valid_gt = dense_rows(valid_csr)
            test_gt = dense_rows(test_csr)
            mask_tv = np.clip(train_rows + valid_gt, 0, 1)
            dataset = DiffusionDataset.from_rows(train_rows)
        else:
            from gdmcf_tpu.data.native import NativeCSR
            train_n = NativeCSR.from_scipy(train_csr[:n_rows])
            # GT/mask splits are MEMBERSHIP semantics (metrics binarize
            # with != 0): strict=False so a duplicate (uid,iid) pair in
            # valid/test — which data_load's COO sum turns into a 2.0
            # cell — cannot make the whole large-catalog path unrunnable
            valid_n = NativeCSR.from_scipy(valid_csr[:n_rows], strict=False)
            test_n = NativeCSR.from_scipy(test_csr[:n_rows], strict=False)
            dataset = train_n

        if self._lr_scheduled and self._lr_total_steps == 0:
            # decay horizon = this run's total optimizer steps; must be set
            # before the first step traces (the schedule closes over it)
            dl = cfg.drop_last or jax.process_count() > 1
            spe = max(len(dataset) // cfg.batch_size if dl
                      else -(-len(dataset) // cfg.batch_size), 1)
            self._lr_total_steps = cfg.epochs * spe

        state = self.init_state()
        log(f"Number of all parameters: {self.num_params(state)}")


        if checkpointer is None and cfg.ckpt_dir:
            from gdmcf_tpu.train.checkpoint import Checkpointer
            checkpointer = Checkpointer(cfg.ckpt_dir)
        periodic = None
        if checkpointer is not None and cfg.ckpt_every > 0:
            # separate stream with its own rotation: periodic saves must
            # never rotate out the best-eval checkpoint, and a plateau
            # preemption must not lose every epoch since the last best
            from gdmcf_tpu.train.checkpoint import Checkpointer
            periodic = Checkpointer(
                os.path.join(checkpointer.directory, "periodic"),
                max_to_keep=2)
        start_epoch = 1
        best_metric, best_epoch, best_results = -100.0, 0, None
        if checkpointer is not None and cfg.resume:
            # resume from whichever stream holds the NEWEST step
            src, latest = checkpointer, checkpointer.latest_step()
            if periodic is not None:
                p_latest = periodic.latest_step()
                if p_latest is not None and (latest is None
                                             or p_latest > latest):
                    src, latest = periodic, p_latest
            if latest is not None:
                state = src.restore(state)
                # ceil when partial batches train (drop_last=False); multi
                # -host always drops (train_epoch forces it)
                drop = cfg.drop_last or jax.process_count() > 1
                n_b, bs_ = len(dataset), cfg.batch_size
                steps_per_epoch = max(
                    n_b // bs_ if drop else -(-n_b // bs_), 1)
                start_epoch = int(state.step) // steps_per_epoch + 1
                log(f"resumed from checkpoint at step {int(state.step)} "
                    f"(epoch {start_epoch})")
                meta = src.load_extra()
                if meta is not None:
                    # restore model selection so the first post-resume eval
                    # does not spuriously become a "new best" (and early-stop
                    # counts from the true best epoch, as an uninterrupted
                    # run would)
                    best_metric = float(meta.get("best_metric", best_metric))
                    best_epoch = int(meta.get("best_epoch", best_epoch))
                    # without this, a resumed run that never improves on the
                    # restored best would end with best_results=None — no
                    # final results block, None returned to the caller —
                    # where the uninterrupted run would report its best
                    best_results = meta.get("best_results")
                else:  # no sidecar (pre-existing checkpoint): don't stop at once
                    best_epoch = max(start_epoch - 1, 0)
        topn = cfg.topN
        for epoch in range(start_epoch, cfg.epochs + 1):
            if epoch - best_epoch >= cfg.early_stop_patience:
                log("-" * 18)
                log("Exiting from training early")
                break
            start_time = time.time()
            # per-epoch seeded shuffle stream: a resumed run at epoch E
            # reproduces exactly the permutation the uninterrupted run
            # would have used (a single fit-lifetime rng restarts at its
            # epoch-1 state on resume — silent trajectory divergence,
            # round-5 review finding; the rest of the state IS in the
            # checkpoint)
            state, total_loss = self.train_epoch(
                state, dataset, np.random.default_rng((cfg.random_seed,
                                                       epoch)))

            if epoch % cfg.eval_every == 0:
                if cfg.host_dense:
                    valid_results = self.evaluate(
                        state, train_rows, valid_gt, train_rows, topn)
                    if cfg.tst_w_val:
                        # input rows == history mask here (train+valid); reuse
                        # the hoisted mask_tv so the eval-batch cache hits.
                        # drop_last=False: the reference's test_twv_loader is
                        # built without drop_last (ref main.py:176)
                        test_results = self.evaluate(
                            state, mask_tv, test_gt, mask_tv, topn,
                            drop_last=False)
                    else:
                        test_results = self.evaluate(
                            state, train_rows, test_gt, mask_tv, topn)
                else:
                    valid_results = self.evaluate_streaming(
                        state, [train_n], valid_n, [train_n], topn)
                    test_inputs = ([train_n, valid_n] if cfg.tst_w_val
                                   else [train_n])
                    test_results = self.evaluate_streaming(
                        state, test_inputs, test_n, [train_n, valid_n], topn,
                        drop_last=False if cfg.tst_w_val else None)
                print_results(None, valid_results, test_results)
                if metric_logger is not None:
                    metric_logger.eval_results(epoch, "valid", topn, valid_results)
                    metric_logger.eval_results(epoch, "test", topn, test_results)

                # selection metric: index [2] is NDCG (despite the reference's
                # "recall" comment), cutoff topN[1] (ref main.py:362-363);
                # falls back to the only cutoff if just one is configured
                sel = min(1, len(topn) - 1)
                if valid_results[2][sel] > best_metric:
                    if cfg.fidelity:
                        best_metric = test_results[2][sel]  # reference quirk
                    else:
                        best_metric = valid_results[2][sel]
                    best_epoch = epoch
                    best_results = test_results
                    if checkpointer is not None:
                        # async: epochs continue through the checkpoint IO;
                        # the next save (or the end-of-fit wait) syncs
                        checkpointer.save(state, extra={
                            "best_metric": float(best_metric),
                            "best_epoch": int(best_epoch),
                            "best_results": best_results}, block=False)

            if periodic is not None and epoch % cfg.ckpt_every == 0:
                # carries the CURRENT selection state so a periodic resume
                # doesn't reset best tracking either
                periodic.save(state, extra={
                    "best_metric": float(best_metric),
                    "best_epoch": int(best_epoch),
                    "best_results": best_results}, block=False)
            log("Runing Epoch {:03d} train loss {:.4f} costs {}".format(
                epoch, total_loss,
                time.strftime("%H: %M: %S", time.gmtime(time.time() - start_time))))
            if metric_logger is not None:
                metric_logger.metrics(epoch, train_loss=total_loss,
                                      epoch_s=time.time() - start_time)
        log("=" * 54)
        log(f"End. Best Epoch {best_epoch:03d}")
        if best_results is not None:
            print_results(None, None, best_results)
        if checkpointer is not None:
            checkpointer.wait()  # commit any in-flight background save
        if periodic is not None:
            periodic.wait()
        return state, best_results
