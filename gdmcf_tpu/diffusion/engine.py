"""Graph-diffusion engine: dual-channel corruption, losses, fused reverse sampler.

TPU-native re-design of the reference ``GaussianDiffusionDiscrete``
(``/root/reference/models/gaussian_diffusion.py:552-1135``). Key idiomatic moves:

* The 2-state "multinomial" discrete channel (ref sample_discrete_features
  :999-1039) reduces exactly to a per-cell Bernoulli on the probability of
  state 1 — computed as a closed form of the transition matrix
  ``Q_bar = a*I + (1-a)*u_x`` (ref get_Qt_bar :597-614) — so corruption is one
  fused elementwise op instead of a [B*n, 2] multinomial.
* The delete-only AND mask (ref :851) and the one-hot [B, n, 2] encoding are
  carried as two binary channels computed in closed form.
* The reverse sampler (ref p_sample :668-768) is ONE ``lax.scan`` over the T
  steps carrying ``(x_t, graph, key)`` — the whole denoise loop stays
  HBM-resident in a single XLA program; the degree-guided synthetic-graph
  growth (ref :710-729) becomes static-shape Bernoulli + OR masking.
* The importance-sampler ring buffer (ref Lt_history python loop :935-949)
  is explicit jittable state (LtState) updated on-device.

Fidelity quirks reproduced when ``fidelity=True`` (SURVEY.md §3.5):
  - alpha_bar for the discrete channel is ``ts / batch_size`` (ref :775-776),
    not an index into the cumprod table. ``fidelity=False`` uses
    ``alphas_cumprod[ts]`` instead.
  - discrete noise can only delete interactions, never add (ref :851).
  - timesteps are sampled twice per training step (ref :845 and :865); the
    continuous draw drives the model, the weight, and the Lt update.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gdmcf_tpu.diffusion.schedules import (
    DiffusionCoeffs,
    compute_coeffs,
    extract,
    get_betas,
)


class MeanType(enum.Enum):
    START_X = enum.auto()
    EPSILON = enum.auto()


class LtState(NamedTuple):
    """Importance-sampling state: per-step loss history ring buffer."""

    history: jnp.ndarray  # [steps, history_num_per_term]
    count: jnp.ndarray    # [steps] int32

    @staticmethod
    def create(steps: int, history_num_per_term: int = 10) -> "LtState":
        return LtState(
            history=jnp.zeros((steps, history_num_per_term), dtype=jnp.float32),
            count=jnp.zeros((steps,), dtype=jnp.int32),
        )


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dimensions (ref mean_flat :1822-1826)."""
    return x.reshape(x.shape[0], -1).mean(axis=1)


def mix_tensors(key: jax.Array, t1: jnp.ndarray, t2: jnp.ndarray,
                mix_prob: float = 0.5) -> jnp.ndarray:
    """Bernoulli element blending (ref mix_tensors :33-52): each cell comes
    from t1 with probability mix_prob, else from t2."""
    assert t1.shape == t2.shape
    mask = jax.random.bernoulli(key, mix_prob, t1.shape).astype(t1.dtype)
    return mask * t1 + (1.0 - mask) * t2


def absorbing_qt_bar(alpha_bar_t: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Absorbing-state transition matrices Q_bar = a*I + (1-a)*1 — the
    reference's vestigial AbsorbingStateTransition helper (ref :14-27),
    kept for API parity. alpha_bar_t: [B] -> [B, C, C]."""
    a = alpha_bar_t[:, None, None]
    eye = jnp.eye(num_classes)[None]
    return a * eye + (1.0 - a) * jnp.ones((1, num_classes, num_classes))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two diagonal Gaussians (ref normal_kl :1793-1820;
    defined-but-unused in the reference's live path, kept for API parity)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


# Model apply signature shared by all backbones:
#   apply(params, x, t, x_U, index, graph, *, train, rng) -> (scores, closs|None)
ModelApply = Callable[..., Tuple[jnp.ndarray, Optional[jnp.ndarray]]]


@dataclass(frozen=True)
class Diffusion:
    """Static diffusion configuration + coefficient tables.

    Hashable/frozen so instances can be closed over by jitted functions.
    """

    mean_type: MeanType
    steps: int
    noise_scale: float
    discrete_eps: float          # ref ``--discrete`` (epsilon of u_x)
    coeffs: Optional[DiffusionCoeffs] = field(compare=False, hash=False, default=None)
    # eq/hash surrogate for the excluded table: without it, two instances
    # built from DIFFERENT schedules (e.g. linear-var vs cosine at the same
    # steps/noise_scale) would compare and hash EQUAL — a silent wrong-table
    # cache hit if a Diffusion is ever used as a jit static arg / cache key.
    # Auto-derived from the betas in __post_init__; do not pass explicitly.
    coeffs_digest: Optional[str] = None
    cat_one_hot: bool = True     # ref CatOneHot (OneHotMatrix == 2)
    index_in: bool = True        # ref indexIn (embedding backbones)
    discrete_noise: bool = True
    user_guided: bool = True
    fidelity: bool = True
    history_num_per_term: int = 10
    uniform_prob: float = 0.001
    # "discrete"  — GaussianDiffusionDiscrete (ref :552-1135), the live class
    # "legacy"    — GaussianDiffusion (ref :54-547): continuous-only corruption
    #               (x_tU is a q_sample of the one-hot), no graph growth, no
    #               contrastive loss; supports the gcn-routed backbones
    # "ablation"  — GaussianDiffusionAblation (ref :1201-1763): identical
    #               corruption but the model sees the CLEAN x_start / one-hot
    #               (ref :1518-1520) with only the graph corrupted, and the
    #               degree gate is ALWAYS applied in p_sample (ref :1367)
    variant: str = "discrete"

    def __post_init__(self):
        if self.coeffs is not None and self.coeffs_digest is None:
            import hashlib

            import numpy as _np

            digest = hashlib.sha1(
                _np.asarray(self.coeffs.betas,
                            dtype=_np.float64).tobytes()).hexdigest()
            object.__setattr__(self, "coeffs_digest", digest)

    @staticmethod
    def create(cfg, mean_type: Optional[MeanType] = None, index_in: bool = True,
               variant: str = "discrete") -> "Diffusion":
        if mean_type is None:
            mean_type = MeanType.START_X if cfg.mean_type == "x0" else MeanType.EPSILON
        coeffs = None
        if cfg.noise_scale != 0.0:
            betas = get_betas(cfg.noise_schedule, cfg.steps, cfg.noise_scale,
                              cfg.noise_min, cfg.noise_max, cfg.beta_fixed)
            coeffs = compute_coeffs(betas)
        return Diffusion(
            mean_type=mean_type,
            steps=cfg.steps,
            noise_scale=cfg.noise_scale,
            discrete_eps=cfg.discrete,
            coeffs=coeffs,
            cat_one_hot=(cfg.OneHotMatrix == 2),
            index_in=index_in,
            user_guided=bool(cfg.user_guided),
            fidelity=cfg.fidelity,
            history_num_per_term=cfg.history_num_per_term,
            variant=variant,
        )

    # ------------------------------------------------------------------
    # continuous channel (ref q_sample :988-996, posterior :1041-1061)
    # ------------------------------------------------------------------
    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray,
                 noise: jnp.ndarray) -> jnp.ndarray:
        c = self.coeffs
        return (extract(c.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
                + extract(c.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise)

    def q_posterior_mean(self, x_start: jnp.ndarray, x_t: jnp.ndarray,
                         t: jnp.ndarray) -> jnp.ndarray:
        c = self.coeffs
        return (extract(c.posterior_mean_coef1, t, x_t.ndim) * x_start
                + extract(c.posterior_mean_coef2, t, x_t.ndim) * x_t)

    def predict_xstart_from_eps(self, x_t: jnp.ndarray, t: jnp.ndarray,
                                eps: jnp.ndarray) -> jnp.ndarray:
        c = self.coeffs
        return (extract(c.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
                - extract(c.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps)

    def snr(self, t: jnp.ndarray) -> jnp.ndarray:
        """SNR(t) = alpha_bar / (1 - alpha_bar); t=-1 wraps like torch (ref :1113-1118)."""
        ac = jnp.asarray(self.coeffs.alphas_cumprod)[t]
        return ac / (1.0 - ac)

    # ------------------------------------------------------------------
    # discrete channel (ref get_Qt_bar :597-614, apply_noise :770-831)
    # ------------------------------------------------------------------
    def _alpha_bar_discrete(self, ts: jnp.ndarray, batch_size: int) -> jnp.ndarray:
        if self.fidelity:
            # Reference quirk: alpha_bar := ts / batch_size (ref :775-776).
            # Clipped to [0,1]: with full-size batches (the reference's strict
            # drop_last) ts < steps <= B so the clip is a no-op, but this repo
            # also serves partial batches, where B < steps would otherwise
            # yield out-of-range Bernoulli probabilities that jax silently
            # saturates (changing corruption semantics without warning).
            return jnp.clip(ts.astype(jnp.float32) / batch_size, 0.0, 1.0)
        return jnp.asarray(self.coeffs.alphas_cumprod)[ts].astype(jnp.float32)

    def discrete_p_one(self, alpha_bar: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """P(state 1 | current state x) under Q_bar = a*I + (1-a)*u_x.

        Row for x=0: [a + (1-a)*eps, (1-a)*(1-eps)]
        Row for x=1: [(1-a)*eps,     a + (1-a)*(1-eps)]
        """
        eps = self.discrete_eps
        a = alpha_bar.reshape(alpha_bar.shape + (1,) * (x.ndim - alpha_bar.ndim))
        p1 = (1.0 - a) * (1.0 - eps)
        return jnp.where(x > 0.5, a + p1, p1)

    def apply_noise(self, key: jax.Array, ts: jnp.ndarray,
                    x_binary: jnp.ndarray) -> jnp.ndarray:
        """Sample the 2-state channel; returns the binary state-1 sample [B, n].

        Equivalent to ref apply_noise + sample_discrete_features (:770-831,
        :999-1039): the per-cell 2-class multinomial is a Bernoulli on p(1).
        """
        a = self._alpha_bar_discrete(ts, x_binary.shape[0])
        p1 = self.discrete_p_one(a, x_binary)
        return jax.random.bernoulli(key, p1).astype(x_binary.dtype)

    def corrupt_discrete(self, key: jax.Array, ts: jnp.ndarray,
                         x_binary: jnp.ndarray) -> jnp.ndarray:
        """Training-side discrete corruption as a one-hot [B, n, 2] tensor.

        Reproduces ``apply_noise(ts, onehot(x0)) & onehot(x0)`` (ref :849-852):
        the AND with the clean one-hot makes noise delete-only and produces a
        third (0,0) state for disagreeing cells:
            channel1 = x0 AND sample;  channel0 = (1-x0) AND (1-sample)
        """
        s = self.apply_noise(key, ts, x_binary)
        c1 = x_binary * s
        c0 = (1.0 - x_binary) * (1.0 - s)
        return jnp.stack([c0, c1], axis=-1)

    # ------------------------------------------------------------------
    # legacy n-state machinery (ref GaussianDiffusion.apply_noise :226-273)
    # ------------------------------------------------------------------
    def legacy_apply_noise(self, key: jax.Array, ts: jnp.ndarray,
                           x: jnp.ndarray, num_nodes: Optional[int] = None,
                           x_base: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """The legacy class's n-state discrete corruption, made runnable.

        Reference status (documented decision): ``GaussianDiffusion.apply_noise``
        is DEAD code — its only call sites are commented out (ref :327 in
        training_losses, :204 region in p_sample) — and, as written, cannot
        execute at all: ``get_Qt_bar`` broadcasts ``alpha_bar_t`` expanded to
        the 2-state ``u_x`` shape [bs,2,2] against ``eye(num_nodes=2810)``
        (ref :91-108), a shape mismatch that raises for every input. The
        *intent* is unambiguous from the commented
        ``nn.Parameter(th.ones(1, num_nodes, num_nodes))`` (ref :88):
        an n-state uniform transition ``Q̄ = a*I_N + (1-a)*1``.

        This implements that intent in closed form, O(B*N) instead of the
        reference's O(B*N^2) materialized Q̄:
          * per occupied cell (b,i), the row-normalized categorical over j is
            the mixture: pick j=i with probability a/(a+N(1-a)), else uniform
            over N — sampled exactly without building [B,N,N].
          * zero cells: the reference's ``multinomial`` would raise on the
            all-zero row (one more way the path cannot run); here they sample
            uniform (the a->0 limit).
          * binarize by the reference's index threshold quirk:
            ``x_t = sampled_index > randint(0.8*N, N)`` (ref :255-256).
          * Bernoulli-blend with x_start (p=0.8) or x_base (p=0.99)
            via ``mix_tensors`` (ref :269-273).
        """
        n = x.shape[1] if num_nodes is None else num_nodes
        a = self._alpha_bar_discrete(ts, x.shape[0])[:, None]  # tsF quirk
        k_pick, k_unif, k_thresh, k_mix = jax.random.split(key, 4)
        z = a + n * (1.0 - a)
        keep = jax.random.bernoulli(k_pick, jnp.broadcast_to(a / z, x.shape))
        uniform_j = jax.random.randint(k_unif, x.shape, 0, n)
        own_j = jnp.broadcast_to(jnp.arange(x.shape[1])[None, :], x.shape)
        sampled = jnp.where(keep, own_j, uniform_j)
        # zero cells -> uniform (the reference would crash here)
        sampled = jnp.where(x > 0.5, sampled, uniform_j)
        thresh = jax.random.randint(k_thresh, (), int(n * 0.8), n + 1)
        x_t = (sampled > thresh).astype(x.dtype)
        if x_base is None:
            return mix_tensors(k_mix, x, x_t, 0.8)
        return mix_tensors(k_mix, x_base, x_t, 0.99)

    # ------------------------------------------------------------------
    # timestep importance sampling (ref sample_timesteps :959-986)
    # ------------------------------------------------------------------
    def sample_timesteps(self, key: jax.Array, lt: LtState,
                         batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        all_full = jnp.all(lt.count == self.history_num_per_term)

        def importance(k):
            lt_sqrt = jnp.sqrt(jnp.mean(lt.history ** 2, axis=-1))
            pt_all = lt_sqrt / jnp.sum(lt_sqrt)
            pt_all = pt_all * (1.0 - self.uniform_prob) + self.uniform_prob / self.steps
            t = jax.random.categorical(k, jnp.log(pt_all), shape=(batch_size,))
            pt = pt_all[t] * self.steps
            return t.astype(jnp.int32), pt

        def uniform(k):
            t = jax.random.randint(k, (batch_size,), 0, self.steps, dtype=jnp.int32)
            return t, jnp.ones((batch_size,), dtype=jnp.float32)

        return jax.lax.cond(all_full, importance, uniform, key)

    def update_lt(self, lt: LtState, ts: jnp.ndarray,
                  losses: jnp.ndarray) -> LtState:
        """Vectorized ring-buffer update with the reference's exact
        sequential-per-example semantics (ref :935-949).

        The torch loop appends each example's loss to its timestep's ring in
        batch order (write-at-count while filling, shift-left once full).
        The aggregate effect per timestep row is: concatenate the row's
        current first `count` entries with that timestep's batch losses in
        order, keep the LAST H, saturate the count. That closed form runs as
        one O(steps x (B+H)) batched computation instead of a B-long serial
        scatter chain — the original formulation cost ~B sequential
        dynamic-updates per training step on TPU.
        (Equality with the sequential loop is asserted in tests.)
        """
        h = self.history_num_per_term
        b = ts.shape[0]
        losses = jax.lax.stop_gradient(losses).astype(lt.history.dtype)

        def per_step(t, carry):
            hist, cnt = carry
            mask = ts == t
            k = mask.sum()
            c = cnt[t]
            # seq[0:c] = old row prefix, seq[c:c+k] = this step's losses in
            # batch order, rest zero
            seq = jnp.zeros((h + b,), dtype=hist.dtype)
            seq = seq.at[jnp.arange(h)].add(
                jnp.where(jnp.arange(h) < c, hist[t], 0.0))
            pos = c + jnp.cumsum(mask) - 1
            pos = jnp.where(mask, pos, h + b - 1)  # park unmasked writes
            seq = seq.at[pos].add(jnp.where(mask, losses, 0.0))
            total = c + k
            start = jnp.maximum(total - h, 0)
            row = jax.lax.dynamic_slice(seq, (start,), (h,))
            hist = hist.at[t].set(row)
            cnt = cnt.at[t].set(jnp.minimum(total, h))
            return hist, cnt

        hist, cnt = jax.lax.fori_loop(0, self.steps, per_step,
                                      (lt.history, lt.count))
        return LtState(history=hist, count=cnt)

    def update_lt_sequential(self, lt: LtState, ts: jnp.ndarray,
                             losses: jnp.ndarray) -> LtState:
        """Direct per-example transcription of the reference loop (ref
        :935-949); kept as the oracle for update_lt's closed form."""
        h = self.history_num_per_term

        def body(i, carry):
            hist, cnt = carry
            t = ts[i]
            l = jax.lax.stop_gradient(losses[i]).astype(hist.dtype)
            full = cnt[t] >= h
            row = hist[t]
            shifted = jnp.concatenate([row[1:], l[None]])
            appended = row.at[jnp.minimum(cnt[t], h - 1)].set(l)
            hist = hist.at[t].set(jnp.where(full, shifted, appended))
            cnt = cnt.at[t].add(jnp.where(full, 0, 1))
            return hist, cnt

        hist, cnt = jax.lax.fori_loop(0, ts.shape[0], body, (lt.history, lt.count))
        return LtState(history=hist, count=cnt)

    # ------------------------------------------------------------------
    # training loss (ref training_losses :834-957)
    # ------------------------------------------------------------------
    def training_losses(
        self,
        model_apply: ModelApply,
        params: Any,
        x_start: jnp.ndarray,     # [B, n] binary interaction rows
        index: jnp.ndarray,       # [B] user ids
        key: jax.Array,
        lt: LtState,
        reweight: bool = True,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, LtState, dict]:
        """Returns (per-example loss [B], new LtState, aux dict)."""
        if self.coeffs is None and reweight:
            # noise_scale==0 skips the coefficient tables; the SNR/eps
            # reweights below would die on coeffs=None mid-trace with an
            # opaque AttributeError (p_sample has the matching guard).
            raise ValueError(
                "noise_scale=0 builds no diffusion coefficient tables — "
                "training requires reweight=False in that degenerate mode")
        B = x_start.shape[0]
        k_ts_u, k_noise_u, k_ts, k_noise, k_drop = jax.random.split(key, 5)

        x_tU = None
        if self.cat_one_hot and self.variant != "legacy":
            ts_u, _pt_u = self.sample_timesteps(k_ts_u, lt, B)
            if self.discrete_noise:
                x_tU = self.corrupt_discrete(k_noise_u, ts_u, x_start)
            else:
                x_startU = jnp.stack([1.0 - x_start, x_start], axis=-1)
                noise_u = jax.random.normal(k_noise_u, x_startU.shape)
                x_tU = (self.q_sample(x_startU, ts_u, noise_u)
                        if self.noise_scale != 0.0 else x_startU)

        # Second, independent timestep draw drives the continuous channel,
        # the model, the reweighting, and the Lt update (ref :865).
        ts, pt = self.sample_timesteps(k_ts, lt, B)
        noise = jax.random.normal(k_noise, x_start.shape)
        x_t = self.q_sample(x_start, ts, noise) if self.noise_scale != 0.0 else x_start

        if self.variant == "legacy" and self.cat_one_hot:
            # Legacy class: x_tU is a *continuous* q_sample of the one-hot
            # at an INDEPENDENT first timestep draw — the reference's legacy
            # training_losses calls sample_timesteps TWICE (ref :281-291 for
            # the x_tU branch, :294-300 for x_t/model/weights; both against
            # the same Lt state), so the one-hot channel's corruption level
            # is uncorrelated with the model's conditioning t.
            ts_u, _pt_u = self.sample_timesteps(k_ts_u, lt, B)
            x_startU = jnp.stack([1.0 - x_start, x_start], axis=-1)
            noise_u = jax.random.normal(k_noise_u, x_startU.shape)
            x_tU = (self.q_sample(x_startU, ts_u, noise_u)
                    if self.noise_scale != 0.0 else x_startU)

        # Uniform call: backbones ignore the kwargs they don't use. RCloss is
        # only requested on the indexIn path, as the reference does (ref :889).
        rcloss = self.index_in and self.cat_one_hot and self.variant != "legacy"
        if self.variant == "ablation":
            # Ablation trains on the CLEAN inputs; only the graph is the
            # corrupted x_tU (ref :1518-1520).
            clean_onehot = jnp.stack([1.0 - x_start, x_start], axis=-1)
            model_output, closs = model_apply(
                params, x_start, ts, clean_onehot, index=index, graph=x_tU,
                rcloss=rcloss, train=train, rng=k_drop)
        else:
            model_output, closs = model_apply(
                params, x_t, ts, x_tU, index=index, graph=x_tU,
                rcloss=rcloss, train=train, rng=k_drop)

        target = x_start if self.mean_type == MeanType.START_X else noise
        assert model_output.shape == target.shape == x_start.shape
        mse = mean_flat((target - model_output) ** 2)

        if reweight:
            if self.mean_type == MeanType.START_X:
                weight = self.snr(ts - 1) - self.snr(ts)
                weight = jnp.where(ts == 0, 1.0, weight)
                loss = mse
            else:
                c = self.coeffs
                ac = jnp.asarray(c.alphas_cumprod)[ts]
                ac_prev = jnp.asarray(c.alphas_cumprod_prev)[ts]
                betas = jnp.asarray(c.betas)[ts]
                weight = (1.0 - ac) / ((1.0 - ac_prev) ** 2 * (1.0 - betas))
                weight = jnp.where(ts == 0, 1.0, weight)
                likelihood = mean_flat(
                    (x_start - self.predict_xstart_from_eps(x_t, ts, model_output)) ** 2 / 2.0)
                loss = jnp.where(ts == 0, likelihood, mse)
        else:
            weight = jnp.ones_like(mse)
            loss = mse

        weighted = weight * loss
        new_lt = self.update_lt(lt, ts, weighted)
        final = weighted / pt
        if closs is not None:
            final = final + closs * 0.1
        aux = {"mse": mse, "ts": ts, "pt": pt,
               "closs": closs if closs is not None else jnp.zeros(())}
        return final, new_lt, aux

    # ------------------------------------------------------------------
    # reverse sampler (ref p_sample :668-768) — fused lax.scan
    # ------------------------------------------------------------------
    def p_sample(
        self,
        model_apply: ModelApply,
        params: Any,
        x_start: jnp.ndarray,     # [B, n] raw interaction rows
        index: jnp.ndarray,       # [B] user ids
        key: jax.Array,
        sampling_steps: int,
        sampling_noise: bool = False,
    ) -> jnp.ndarray:
        """Full reverse loop in one scan; returns scores [B, n]."""
        assert sampling_steps <= self.steps, "Too much steps in inference."
        if sampling_steps > 0 and self.coeffs is None:
            # noise_scale==0 skips the coefficient tables; q_sample below
            # would die on coeffs=None deep in the trace (the reference
            # crashes identically — calculate_for_diffusion is skipped,
            # ref gaussian_diffusion.py:87-91,669-701). Fail loudly instead.
            raise ValueError(
                "noise_scale=0 supports only sampling_steps=0 (no diffusion "
                "coefficient tables exist to corrupt the starting point)")
        B, n = x_start.shape
        k_init_u, k_init_c, k_loop = jax.random.split(key, 3)

        # -- discrete side input (ref :671-687; legacy variant ref :165-175)
        x_tU = None
        if self.cat_one_hot:
            if sampling_steps == 0:
                x_tU = jnp.stack([1.0 - x_start, x_start], axis=-1)
            else:
                t0 = jnp.full((B,), sampling_steps - 1, dtype=jnp.int32)
                if self.discrete_noise and self.variant != "legacy":
                    x_tU = self.corrupt_discrete(k_init_u, t0, x_start)
                else:
                    x_su = jnp.stack([1.0 - x_start, x_start], axis=-1)
                    x_tU = self.q_sample(x_su, t0, jax.random.normal(k_init_u, x_su.shape))

        # -- continuous starting point (ref :688-693)
        if sampling_steps == 0:
            x_t = x_start
        else:
            t0 = jnp.full((B,), sampling_steps - 1, dtype=jnp.int32)
            x_t = self.q_sample(x_start, t0, jax.random.normal(k_init_c, x_start.shape))

        if self.noise_scale == 0.0:
            # Degenerate path (ref :697-701): iterate the model directly —
            # still ONE lax.scan, not a trace-unrolled python loop (at
            # reference-scale steps the unroll would blow up compile time).
            def plain_step(x_t, i):
                t = jnp.full((B,), i, dtype=jnp.int32)
                out, _ = model_apply(params, x_t, t, x_tU, index=index,
                                     graph=None, rcloss=False,
                                     train=False, rng=None)
                return out, None

            ts_seq = jnp.arange(self.steps - 1, -1, -1, dtype=jnp.int32)
            x_t, _ = jax.lax.scan(plain_step, x_t, ts_seq,
                                  unroll=min(self.steps, 8))
            return x_t

        if self.variant == "legacy":
            # Legacy reverse loop (ref :198-217): plain posterior iteration,
            # no synthetic-graph growth.
            def legacy_step(carry, i):
                x_t, k = carry
                k, k_noise = jax.random.split(k)
                t = jnp.full((B,), i, dtype=jnp.int32)
                model_output, _ = model_apply(
                    params, x_t, t, x_tU, index=index, graph=None,
                    rcloss=False, train=False, rng=None)
                pred = (model_output if self.mean_type == MeanType.START_X
                        else self.predict_xstart_from_eps(x_t, t, model_output))
                mean = self.q_posterior_mean(pred, x_t, t)
                if sampling_noise:
                    c = self.coeffs
                    nz = (t != 0).astype(x_t.dtype).reshape(
                        -1, *([1] * (x_t.ndim - 1)))
                    noise = jax.random.normal(k_noise, x_t.shape)
                    log_var = extract(c.posterior_log_variance_clipped, t, x_t.ndim)
                    mean = mean + nz * jnp.exp(0.5 * log_var) * noise
                return (mean, k), None

            ts_seq = jnp.arange(self.steps - 1, -1, -1, dtype=jnp.int32)
            (x_t, _), _ = jax.lax.scan(legacy_step, (x_t, k_loop), ts_seq,
                                       unroll=min(self.steps, 8))
            return x_t

        # Degree-guided gate probability: per-user normalized degree of the
        # *input* rows (ref :711-713); resampled every step.
        # ALWAYS-ON REPAIR (documented divergence, PARITY.md): for an
        # all-zero eval batch the reference computes x_degree/0 -> NaN and
        # its multinomial raises; the max(.,1e-12) floor instead makes
        # every gate probability 0 (degree gate disabled for a batch with
        # no interactions — the only non-crashing reading). Identical
        # outputs for every non-degenerate batch.
        deg = x_start.sum(axis=1)
        deg_p = deg / jnp.maximum(deg.max(), 1e-12)
        clean_onehot = jnp.stack([1.0 - x_start, x_start], axis=-1)

        def step(carry, i):
            x_t, g, k = carry
            k, k_sprinkle, k_gate, k_noise = jax.random.split(k, 4)
            t = jnp.full((B,), i, dtype=jnp.int32)

            # Synthetic-graph growth (ref :710-729): noise the *current* graph
            # state, gate per-user by degree, OR-accumulate. The AND/argmax/OR
            # one-hot dance collapses to: g' = g | (sample & gate).
            a = self._alpha_bar_discrete(t, B)
            p1 = self.discrete_p_one(a, g)
            s = jax.random.bernoulli(k_sprinkle, p1)
            gate = jax.random.bernoulli(k_gate, deg_p)[:, None]
            # Ablation ALWAYS applies the degree gate (ref :1367); the live
            # class honors --user_guided (ref :720-723).
            if self.user_guided or self.variant == "ablation":
                grown = s & gate
            else:
                grown = s
            g = jnp.logical_or(g > 0.5, grown).astype(x_start.dtype)
            graph = jnp.stack([1.0 - g, g], axis=-1)

            # p_mean_variance (ref :1063-1103). The ablation variant feeds the
            # CLEAN x_start and clean one-hot to the model and to the
            # posterior, so only the grown graph varies per step (ref :1386).
            x_in = x_start if self.variant == "ablation" else x_t
            xu_in = clean_onehot if self.variant == "ablation" else x_tU
            model_output, _ = model_apply(
                params, x_in, t, xu_in, index=index, graph=graph,
                rcloss=False, train=False, rng=None)

            if self.mean_type == MeanType.START_X:
                pred_xstart = model_output
            else:
                pred_xstart = self.predict_xstart_from_eps(x_in, t, model_output)
            mean = self.q_posterior_mean(pred_xstart, x_in, t)

            if sampling_noise:
                c = self.coeffs
                nz = (t != 0).astype(x_t.dtype).reshape(-1, *([1] * (x_t.ndim - 1)))
                noise = jax.random.normal(k_noise, x_t.shape)
                log_var = extract(c.posterior_log_variance_clipped, t, x_t.ndim)
                x_t = mean + nz * jnp.exp(0.5 * log_var) * noise
            else:
                x_t = mean
            return (x_t, g, k), None

        g0 = jnp.zeros_like(x_start)
        ts_seq = jnp.arange(self.steps - 1, -1, -1, dtype=jnp.int32)
        # small T: unrolling lets XLA fuse across reverse steps
        (x_t, _, _), _ = jax.lax.scan(step, (x_t, g0, k_loop), ts_seq,
                                      unroll=min(self.steps, 8))
        return x_t
