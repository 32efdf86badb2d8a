"""LXMERT-style cross-modal encoder — TPU-native (flax/XLA).

The reference framework exists to *feed* LXMERT-style VL transformers (its
FRCNN extractor produces the 36-box 2048-d region features those models
consume — reference: vltk/adapters/frcnn.py:34-41) and its experiment layer
toggles the LXMERT pretraining losses by name (``task_matched /
task_mask_lm / task_obj_predict / task_qa`` — reference:
vltk/configs.py:63-96), but it ships no VL model itself. This module is the
framework-side model: the LXMERT architecture (Tan & Bansal, 1908.07490)
built for TPU:

* static shapes end-to-end: (N, S) tokens + (N, V, 2048) region features,
  no ragged paths;
* bf16 matmuls on the MXU (params stay f32), LayerNorm/softmax in f32;
* tensor parallelism via param-name rules (parallel/sharding.py:LXMERT_RULES)
  — q/k/v + MLP-up column-sharded, output projections row-sharded over the
  ``model`` mesh axis;
* optional sequence-parallel activation constraints over the ``seq`` axis
  for long OCR-document inputs (the reference could only truncate to 128,
  vltk/configs.py:113-114);
* the LXMERT pretraining heads + losses the reference's config toggles
  name: masked LM, cross-modality matching, visual obj/attr/feat heads, QA.

Param naming is chosen so ``models/convert.py:torch_lxmert_to_jax`` can map
HuggingFace ``transformers`` LXMERT checkpoints 1:1 (hermetic parity tests
instantiate a random-init torch model and compare forwards).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -10000.0  # additive mask value, matches BERT/LXMERT convention


@dataclasses.dataclass(frozen=True)
class LxmertConfig:
    """Static hyper-parameters (HF ``unc-nlp/lxmert-base-uncased`` defaults)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    l_layers: int = 9
    x_layers: int = 5
    r_layers: int = 5
    visual_feat_dim: int = 2048
    visual_pos_dim: int = 4
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    # heads
    num_answers: int = 3129
    num_objects: int = 1600
    num_attrs: int = 400
    ignore_id: int = -100
    # compute
    dtype: Optional[str] = None  # "bfloat16" for MXU; params stay f32
    activation_sharding: bool = False  # seq-parallel constraints (needs mesh)
    # Ulysses head-sharded attention for the lang stream (needs
    # activation_sharding and num_heads divisible by model*seq axes) —
    # the real long-context path (SURVEY §5.7)
    seq_attention_sharding: bool = False
    # which sequence-parallel attention backend seq_attention_sharding
    # uses: "ulysses" (head-sharded via all-to-alls; seq degree capped at
    # num_heads // tp) or "ring" (KV rotation via neighbour ppermute,
    # parallel/ring.py; seq degree unconstrained by head count)
    seq_attention_backend: str = "ulysses"
    # rematerialization: wrap every encoder layer in jax.checkpoint so the
    # backward recomputes layer activations instead of storing all L of
    # them — trades ~30% more FLOPs for ~L x less activation HBM, the
    # standard TPU lever for bigger train batches / longer sequences
    remat: bool = False
    # Mixture-of-Experts FFN (models/moe.py): > 0 replaces every dense
    # FFN with moe_experts experts, top-k routed at static capacity,
    # expert kernels sharded over the ``expert`` mesh axis
    # (parallel/sharding.py:LXMERT_MOE_RULES). 0 = dense (default).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_loss_weight: float = 0.01
    # "flash" routes eligible self-attention through the fused Pallas
    # flash-attention kernel (jax.experimental.pallas.ops.tpu) — O(S)
    # HBM instead of materializing the (S, S) score matrix; the
    # long-sequence serving/training lever. Transparent XLA fallback
    # when not applicable (see MultiHeadAttention docstring).
    attention_impl: str = "xla"
    # int8 MXU path for every ENCODER projection + MLP dense (q/k/v,
    # att_out, intermediate, mlp_out — where the transformer's matmul
    # FLOPs live): calibrated static PTQ via layers.Int8Dense, the same
    # recipe + "quant" collection as the FRCNN extraction presets.
    # Params stay f32/nn.Dense-shaped so checkpoints are untouched;
    # embeddings and task heads stay bf16. Serving-only (zero gradient).
    int8: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def compute_dtype(self):
        return jnp.float32 if self.dtype is None else jnp.dtype(self.dtype)


def _dense_init(cfg: LxmertConfig):
    return nn.initializers.normal(stddev=cfg.initializer_range)


def _proj(cfg: LxmertConfig, features: int, name: str, dt):
    """Encoder projection factory: ``nn.Dense``, or ``Int8Dense`` (same
    param names/shapes — checkpoint-transparent) when ``cfg.int8``."""
    if getattr(cfg, "int8", False):
        from vltk_tpu.models.layers import Int8Dense

        return Int8Dense(
            features, kernel_init=_dense_init(cfg), dtype=dt, name=name
        )
    return nn.Dense(features, kernel_init=_dense_init(cfg), dtype=dt, name=name)


def _constrain(x: jnp.ndarray, cfg: LxmertConfig, spec: Tuple) -> jnp.ndarray:
    """Sequence-parallel activation annotation; no-op unless enabled.

    Requires tracing under a mesh context (``with mesh:``) when enabled —
    the train-step builder (train/steps.py) arranges that.
    """
    if not cfg.activation_sharding:
        return x
    from jax.sharding import PartitionSpec as P

    from vltk_tpu.parallel.mesh import current_mesh

    mesh = current_mesh()
    if mesh is not None:
        # axes the active mesh lacks fall back to replication (same
        # philosophy as parallel/sharding.py:_spec_for) so e.g. a
        # data x seq mesh runs the same model code as data x seq x model
        def keep(e):
            if isinstance(e, tuple):
                kept = tuple(a for a in e if a in mesh.axis_names)
                return kept if kept else None
            return e if (e is None or e in mesh.axis_names) else None

        spec = tuple(keep(e) for e in spec)
    return jax.lax.with_sharding_constraint(x, P(*spec))


def _flash_applicable(s: int, deterministic: bool, attention_dropout) -> bool:
    """Shape/mode gate shared by every model that can route self-attention
    through the fused kernel (LXMERT/LayoutLM/VisualBERT here, ViT in
    models/vit.py). True iff ALL of:

    * sequence length >= one 128 Mosaic block — shorter streams (VQA's
      20 tokens, the 36-region visual stream) would spend more on pad
      compute than the fusion saves; non-multiples of 128 at or above a
      block are padded inside ``_flash_self_attention``,
    * attention dropout is inactive (the kernel has none; train with
      ``attention_dropout=0.0`` to keep flash in the backward too),
    * running on TPU (Mosaic kernels don't lower elsewhere).
    """
    import jax as _jax

    return (
        s >= 128
        and (deterministic or attention_dropout == 0.0)
        and _jax.default_backend() == "tpu"
    )


def _impl_wants_flash(cfg, s: int) -> bool:
    """``attention_impl`` routing policy (composes with the
    ``_flash_applicable`` hardware/shape gate):

    * ``"xla"``   — never use the fused kernel (default; exact-pad
      semantics, runs everywhere).
    * ``"flash"`` — always try it (falls back off-TPU / short seq).
    * ``"auto"``  — use it exactly where it is MEASURED to win on v5e
      (BASELINE.md r4 tuned-block table): padded length >= 1024 —
      +25%/+28%/+89% serving at seq-1024/4096/8192, +39% training at
      seq-4096, parity at 1024 training; short streams (ViT's padded
      256, VQA's 20) measured slower and stay on xla.
    """
    impl = getattr(cfg, "attention_impl", "xla")
    if impl == "flash":
        return True
    return impl == "auto" and s + ((-s) % 128) >= 1024


def _flash_eligible(x, ctx, s: int, deterministic: bool, cfg) -> bool:
    """Whether the fused flash kernel applies to this attention call.

    Falls back to the XLA formulation (transparently — so one config
    runs on every backend/shape) unless it is self-attention (``ctx is
    x``; cross-attention's KV side is the 36-region visual stream, far
    below the kernel's 128 block) and ``_flash_applicable`` holds.

    Note one deliberate semantic difference from the XLA path: padding
    is enforced via segment ids, which *also* stops pad queries from
    attending to real keys. Outputs at pad positions therefore differ —
    they are don't-care downstream (pooling reads CLS, losses mask) but
    comparisons must restrict to real positions.
    """
    return ctx is x and _flash_applicable(
        s, deterministic, cfg.attention_dropout
    )


def _tuned_block_sizes(s_padded: int):
    """Measured flash-kernel block sizes for v5e (tools/probe_flash.py
    --sweep / --sweep-bwd; BASELINE.md r4). The upstream default —
    128-blocks everywhere — runs the kernel at 0.27-0.29x the XLA
    attention at dh=64 (a (128, 64)x(64, 128) matmul per grid step
    cannot amortize the MXU); 1024-blocks flip the FORWARD to 2.2-2.4x
    FASTER. The backward tile is length-conditional: the isolated-kernel
    sweep (--sweep-bwd) measured bwd=512 best at BOTH 1024 and 4096, but
    the MODEL-level training rows (pass-7, tools/tpu_rows.jsonl) split —
    bwd=512 wins seq-1024 (91.66 vs 90.7 img/s) while uniform-1024 wins
    seq-4096 (15.0 vs 13.84) and seq-8192 (5.03 vs 4.76): inside the
    full layer program XLA schedules around the kernel differently than
    the microbench. Model-level rows rule: cap the backward at 512 only
    for padded lengths <= 1024, match the forward above."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    for b in (1024, 512, 256, 128):
        if s_padded % b == 0:
            bb = min(b, 512) if s_padded <= 1024 else b
            return _fa.BlockSizes(
                block_q=b, block_k_major=b, block_k=b, block_b=1,
                block_q_major_dkv=bb, block_k_major_dkv=bb, block_k_dkv=bb,
                block_q_dkv=bb, block_k_major_dq=bb, block_k_dq=bb,
                block_q_dq=bb,
            )
    raise AssertionError(f"padded length {s_padded} not a 128 multiple")


def _flash_self_attention(q, k, v, mask, dh: int, block_sizes=None):
    """(n, s, nh, dh) q/k/v -> flash attention output, same layout.

    Wraps ``jax.experimental.pallas.ops.tpu.flash_attention`` (public
    JAX Pallas op, custom-VJP so jax.grad stays fused): online-softmax
    blocks in VMEM, O(S) HBM traffic instead of the XLA path's
    materialized (n, nh, S, S) score/prob tensors.

    ``block_sizes``: an explicit ``flash_attention.BlockSizes``
    override; the default is :func:`_tuned_block_sizes` (uniform
    1024-or-largest-tiling blocks), which measured 2.2-2.4x faster
    forward than the XLA path at seq-1024/4096 where the upstream
    128-block default measured 3.4x SLOWER (tools/probe_flash.py
    --sweep; full story in BASELINE.md).
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    n, s = q.shape[0], q.shape[1]
    pad = (-s) % 128  # kernel blocks are 128-wide; pad odd lengths up
    if pad and mask is None:
        mask = jnp.ones((n, s), jnp.float32)
    if pad:
        grow = lambda a: jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))  # noqa: E731
        q, k, v, mask = grow(q), grow(k), grow(v), grow(mask)
    qt = jnp.transpose(q, (0, 2, 1, 3))  # (n, nh, s, dh)
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    seg = None
    if mask is not None:
        ids = mask.astype(jnp.int32)  # 1 = real, 0 = pad
        seg = _fa.SegmentIds(q=ids, kv=ids)
    if block_sizes is None:
        block_sizes = _tuned_block_sizes(s + pad)
    out = _fa.flash_attention(
        qt, kt, vt, segment_ids=seg, sm_scale=1.0 / float(dh) ** 0.5,
        block_sizes=block_sizes,
    )
    return jnp.transpose(out, (0, 2, 1, 3))[:, :s]


class MultiHeadAttention(nn.Module):
    """Post-LN residual attention block: ``ln(x + dropout(proj(attn)))``.

    Generic over context so one module serves self-attention (ctx=x) and
    cross-attention (ctx=other modality); LXMERT shares one cross-attention
    weight set for both directions, which the caller gets by applying this
    module twice with swapped inputs.

    ``seq_shard=True`` (with cfg.activation_sharding) turns on
    Ulysses-style sequence parallelism (DeepSpeed-Ulysses, 2309.14509) for
    this call: the residual stream stays *sequence*-sharded over the
    ``seq`` mesh axis, and the q/k/v tensors are re-constrained to
    *head*-sharded — XLA lowers the layout switch to all-to-alls over ICI —
    so every device computes full-sequence attention for nh/seq_parallel
    heads and no device ever holds the full (S, S) score matrix row block
    for all heads. The attention output is constrained back to
    sequence-sharded before the output projection. This is what makes
    OCR-document token streams beyond 512 trainable (SURVEY §5.7); the
    reference could only truncate (reference: vltk/configs.py:113-114).
    """

    cfg: LxmertConfig

    @nn.compact
    def __call__(
        self, x, ctx, ctx_mask, deterministic: bool = True,
        seq_shard: bool = False,
    ):
        cfg = self.cfg
        dt = cfg.compute_dtype
        n, s, h = x.shape
        nh, dh = cfg.num_heads, cfg.head_dim

        q = _proj(cfg, h, "query", dt)(x)
        k = _proj(cfg, h, "key", dt)(ctx)
        v = _proj(cfg, h, "value", dt)(ctx)
        q = q.reshape(n, s, nh, dh)
        k = k.reshape(n, ctx.shape[1], nh, dh)
        v = v.reshape(n, ctx.shape[1], nh, dh)
        if (
            _impl_wants_flash(cfg, s)
            and not seq_shard
            and _flash_eligible(x, ctx, s, deterministic, cfg)
        ):
            out4 = _flash_self_attention(q, k, v, ctx_mask, dh)
            out = out4.reshape(n, s, h)
            out = _proj(cfg, h, "att_out", dt)(out)
            out = nn.Dropout(cfg.hidden_dropout, name="out_drop")(
                out, deterministic=deterministic
            )
            return nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln"
            )(x + out)
        backend = getattr(cfg, "seq_attention_backend", "ulysses")
        if seq_shard and backend == "ring" and ctx is x:
            # Ring backend (parallel/ring.py): queries stay seq-sharded,
            # K/V shards rotate via neighbour ppermute — no head-count cap
            # on the seq degree and no layout-switch all-to-alls. Cross-
            # attention (ctx is the other modality) doesn't take this
            # branch: its KV side is the short visual stream, so plain
            # dense attention on the seq-sharded queries is already local.
            from vltk_tpu.parallel.mesh import current_mesh
            from vltk_tpu.parallel.ring import ring_self_attention

            mesh = current_mesh()
            if mesh is None:
                raise ValueError(
                    "seq_attention_backend='ring' must be traced under an "
                    "active mesh context (with mesh: / use_mesh)"
                )
            rate = 0.0 if deterministic else cfg.attention_dropout
            drop_rng = self.make_rng("dropout") if rate > 0.0 else None
            out4 = ring_self_attention(
                q, k, v, ctx_mask, mesh=mesh, dropout_rate=rate,
                dropout_rng=drop_rng, compute_dtype=dt,
            )
            out = out4.reshape(n, s, h)
            out = _proj(cfg, h, "att_out", dt)(out)
            out = nn.Dropout(cfg.hidden_dropout, name="out_drop")(
                out, deterministic=deterministic
            )
            return nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln"
            )(x + out)
        if seq_shard and backend == "ulysses":
            # Ulysses all-to-all in: seq-sharded -> head-sharded. Heads are
            # already model-sharded by the TP param rules (q/k/v kernels
            # P(None, "model"), model-major blocks), so "seq" takes the
            # minor head slice — the layout switch is an all-to-all over
            # the seq axis only.
            #
            # The pre-switch constraint pins the SAME-RANK upstream layout
            # first (seq-sharded tokens, model-sharded heads — exactly what
            # sharding propagation infers from the stream + TP kernels), so
            # the layout switch is a clean 4D reshard in the transposed
            # (backward) program too. Without it, the backward cotangent
            # reaches the (n,s,h)<->(n,s,nh,dh) reshape still fully
            # head-sharded and the SPMD partitioner falls back to
            # "involuntary full rematerialization" — replicating the whole
            # activation (the MULTICHIP_r02 dryrun-tail warning).
            ctx_seq = "seq" if ctx is x else None
            q = _constrain(q, cfg, ("data", "seq", "model", None))
            k = _constrain(k, cfg, ("data", ctx_seq, "model", None))
            v = _constrain(v, cfg, ("data", ctx_seq, "model", None))
            q = _constrain(q, cfg, ("data", None, ("model", "seq"), None))
            k = _constrain(k, cfg, ("data", None, ("model", "seq"), None))
            v = _constrain(v, cfg, ("data", None, ("model", "seq"), None))

        scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(
            jnp.asarray(dh, dt)
        )
        if ctx_mask is not None:
            bias = (1.0 - ctx_mask[:, None, None, :]) * NEG_INF
            scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        probs = nn.Dropout(cfg.attention_dropout, name="att_drop")(
            probs, deterministic=deterministic
        )
        out4 = jnp.einsum("nhqk,nkhd->nqhd", probs, v)
        if seq_shard:
            # Ulysses all-to-all out: head-sharded -> seq-sharded, so the
            # output projection and residual run on the seq-sharded stream
            out4 = _constrain(out4, cfg, ("data", "seq", ("model",), None))
        out = out4.reshape(n, s, h)
        out = _proj(cfg, h, "att_out", dt)(out)
        out = nn.Dropout(cfg.hidden_dropout, name="out_drop")(
            out, deterministic=deterministic
        )
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln")(
            x + out
        )


class FeedForward(nn.Module):
    """gelu MLP with post-LN residual (BERT intermediate+output)."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = x.shape[-1]
        y = _proj(cfg, cfg.intermediate_size, "intermediate", dt)(x)
        y = nn.gelu(y, approximate=False)
        y = _proj(cfg, h, "mlp_out", dt)(y)
        y = nn.Dropout(cfg.hidden_dropout, name="drop")(
            y, deterministic=deterministic
        )
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln")(
            x + y
        )


def _ffn_cls(cfg: LxmertConfig):
    """Dense FFN, or the MoE block when ``cfg.moe_experts > 0``
    (models/moe.py — same post-LN residual contract, expert kernels
    sharded over the ``expert`` mesh axis)."""
    if getattr(cfg, "moe_experts", 0) > 0:
        from vltk_tpu.models.moe import MoEFeedForward

        return MoEFeedForward
    return FeedForward


class TransformerLayer(nn.Module):
    """Single-modality layer: self-attention + FFN. ``seq_shard`` enables
    the Ulysses head-sharded attention path (lang stream only)."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True, seq_shard: bool = False):
        x = MultiHeadAttention(self.cfg, name="att")(
            x, x, mask, deterministic, seq_shard=seq_shard
        )
        return _ffn_cls(self.cfg)(self.cfg, name="ffn")(x, deterministic)


class CrossModalityLayer(nn.Module):
    """LXMERT x-layer: shared bi-directional cross-attention, then per-
    modality self-attention and FFN (1908.07490 §3.2)."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, lang, lang_mask, visn, visn_mask, deterministic=True,
                 seq_shard: bool = False):
        cfg = self.cfg
        cross = MultiHeadAttention(cfg, name="cross_att")
        # lang-query cross-attention rides the Ulysses path too (long lang
        # stream, short visual context); the visn-query direction stays
        # replicated over seq (36 tokens)
        lang2 = cross(lang, visn, visn_mask, deterministic, seq_shard=seq_shard)
        visn2 = cross(visn, lang, lang_mask, deterministic)

        lang2 = MultiHeadAttention(cfg, name="lang_self_att")(
            lang2, lang2, lang_mask, deterministic, seq_shard=seq_shard
        )
        visn2 = MultiHeadAttention(cfg, name="visn_self_att")(
            visn2, visn2, visn_mask, deterministic
        )
        ffn = _ffn_cls(cfg)
        lang2 = ffn(cfg, name="lang_ffn")(lang2, deterministic)
        visn2 = ffn(cfg, name="visn_ffn")(visn2, deterministic)
        return lang2, visn2


def _encoder_layers(cfg):
    """(TransformerLayer, CrossModalityLayer), remat-wrapped when
    ``cfg.remat``: each layer's activations are recomputed in the
    backward (jax.checkpoint) instead of stored, shrinking train-time
    activation HBM from O(L) layers to O(1) for ~1/3 extra FLOPs.
    ``static_argnums`` counts the unbound ``__call__`` (0 = module), and
    marks the deterministic/seq_shard python bools; remat call sites
    must pass them positionally."""
    if not getattr(cfg, "remat", False):
        return TransformerLayer, CrossModalityLayer
    return (
        nn.remat(TransformerLayer, static_argnums=(3, 4)),
        nn.remat(CrossModalityLayer, static_argnums=(5, 6)),
    )


class Embeddings(nn.Module):
    """BERT-style token embeddings (word + position + type, LN, dropout)."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        cfg = self.cfg
        n, s = input_ids.shape
        if s > cfg.max_position_embeddings:
            # loud, at trace time: past-the-table position ids NaN-fill
            # silently through nn.Embed's gather (jnp.take fill mode)
            raise ValueError(
                f"sequence length {s} exceeds max_position_embeddings="
                f"{cfg.max_position_embeddings}; raise it in the config"
            )
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        emb_init = nn.initializers.normal(stddev=cfg.initializer_range)
        words = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, embedding_init=emb_init,
            name="word_embeddings",
        )(input_ids)
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, embedding_init=emb_init,
            name="position_embeddings",
        )(jnp.arange(s)[None, :].repeat(n, axis=0))
        types = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, embedding_init=emb_init,
            name="token_type_embeddings",
        )(token_type_ids)
        x = words + pos + types
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln")(x)
        return nn.Dropout(cfg.hidden_dropout, name="drop")(
            x, deterministic=deterministic
        )


class VisualFeatEncoder(nn.Module):
    """Region features + box positions -> hidden (average of the two
    projections, LXMERT convention). Boxes are (x1,y1,x2,y2) normalized to
    [0,1] by image size — the fixed-shape FRCNN output feeds this directly
    (models/frcnn.py output dict)."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, feats, boxes, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        f = nn.Dense(
            cfg.hidden_size, kernel_init=_dense_init(cfg), dtype=dt, name="visn_fc"
        )(feats)
        f = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="visn_ln"
        )(f)
        b = nn.Dense(
            cfg.hidden_size, kernel_init=_dense_init(cfg), dtype=dt, name="box_fc"
        )(boxes)
        b = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="box_ln"
        )(b)
        x = (f + b) / 2.0
        return nn.Dropout(cfg.hidden_dropout, name="drop")(
            x, deterministic=deterministic
        )


class Pooler(nn.Module):
    cfg: LxmertConfig

    @nn.compact
    def __call__(self, lang):
        x = nn.Dense(
            self.cfg.hidden_size, kernel_init=_dense_init(self.cfg), name="dense"
        )(lang[:, 0])
        return jnp.tanh(x)


class Lxmert(nn.Module):
    """Backbone encoder: returns (lang_feats, visn_feats, pooled)."""

    cfg: LxmertConfig = LxmertConfig()

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,       # (N, S) int32
        visual_feats: jnp.ndarray,    # (N, V, visual_feat_dim)
        visual_pos: jnp.ndarray,      # (N, V, 4) normalized xyxy
        attention_mask: Optional[jnp.ndarray] = None,   # (N, S) 1=keep
        visual_mask: Optional[jnp.ndarray] = None,      # (N, V) 1=keep
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.float32)
        attention_mask = attention_mask.astype(jnp.float32)
        if visual_mask is not None:
            visual_mask = visual_mask.astype(jnp.float32)

        lang = Embeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, deterministic
        )
        visn = VisualFeatEncoder(cfg, name="visn_fc")(
            visual_feats.astype(cfg.compute_dtype),
            visual_pos.astype(cfg.compute_dtype),
            deterministic,
        )
        lang = _constrain(lang, cfg, ("data", "seq", None))

        seq_shard = cfg.activation_sharding and cfg.seq_attention_sharding
        Layer, XLayer = _encoder_layers(cfg)
        for i in range(cfg.l_layers):
            lang = Layer(cfg, name=f"layer_{i}")(
                lang, attention_mask, deterministic, seq_shard
            )
            lang = _constrain(lang, cfg, ("data", "seq", None))
        for i in range(cfg.r_layers):
            visn = Layer(cfg, name=f"r_layer_{i}")(
                visn, visual_mask, deterministic, False
            )
        for i in range(cfg.x_layers):
            lang, visn = XLayer(cfg, name=f"x_layer_{i}")(
                lang, attention_mask, visn, visual_mask, deterministic,
                seq_shard,
            )
            lang = _constrain(lang, cfg, ("data", "seq", None))

        pooled = Pooler(cfg, name="pooler")(lang.astype(jnp.float32))
        return lang.astype(jnp.float32), visn.astype(jnp.float32), pooled


class AnswerHead(nn.Module):
    """VQA answer head: pooled -> 2h gelu LN -> num_answers (LXMERT)."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, pooled):
        cfg = self.cfg
        x = nn.Dense(
            cfg.hidden_size * 2, kernel_init=_dense_init(cfg), name="fc"
        )(pooled)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln")(x)
        return nn.Dense(
            cfg.num_answers, kernel_init=_dense_init(cfg), name="logit"
        )(x)


class LxmertForVQA(nn.Module):
    """Encoder + answer head (BASELINE.json config 4: end-to-end VQA)."""

    cfg: LxmertConfig = LxmertConfig()

    @nn.compact
    def __call__(self, input_ids, visual_feats, visual_pos,
                 attention_mask=None, visual_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        _, _, pooled = Lxmert(self.cfg, name="lxmert")(
            input_ids, visual_feats, visual_pos, attention_mask, visual_mask,
            token_type_ids, deterministic,
        )
        return AnswerHead(self.cfg, name="answer_head")(pooled)


class MLMHead(nn.Module):
    """BERT LM head: transform + decode to vocab (tied weights optional —
    kept untied here; tying is a checkpoint-conversion detail)."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, lang):
        cfg = self.cfg
        x = nn.Dense(
            cfg.hidden_size, kernel_init=_dense_init(cfg), name="transform"
        )(lang)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln")(x)
        return nn.Dense(
            cfg.vocab_size, kernel_init=_dense_init(cfg), name="decoder"
        )(x)


class VisualHead(nn.Module):
    """Visual pretraining heads over visn states: obj / attr / feat."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, visn):
        cfg = self.cfg
        x = nn.Dense(
            cfg.hidden_size, kernel_init=_dense_init(cfg), name="transform"
        )(visn)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln")(x)
        obj = nn.Dense(cfg.num_objects, kernel_init=_dense_init(cfg), name="obj")(x)
        attr = nn.Dense(cfg.num_attrs, kernel_init=_dense_init(cfg), name="attr")(x)
        feat = nn.Dense(
            cfg.visual_feat_dim, kernel_init=_dense_init(cfg), name="feat"
        )(x)
        return obj, attr, feat


class LxmertForPretraining(nn.Module):
    """All LXMERT pretraining heads; which losses apply is a train-config
    toggle (reference names: task_matched/task_mask_lm/task_obj_predict/
    task_qa, vltk/configs.py:63-96)."""

    cfg: LxmertConfig = LxmertConfig()

    @nn.compact
    def __call__(self, input_ids, visual_feats, visual_pos,
                 attention_mask=None, visual_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        lang, visn, pooled = Lxmert(self.cfg, name="lxmert")(
            input_ids, visual_feats, visual_pos, attention_mask, visual_mask,
            token_type_ids, deterministic,
        )
        out = {"lang": lang, "visn": visn, "pooled": pooled}
        out["mlm_logits"] = MLMHead(self.cfg, name="mlm_head")(lang)
        out["matched_logits"] = nn.Dense(
            2, kernel_init=_dense_init(self.cfg), name="matched_head"
        )(pooled)
        obj, attr, feat = VisualHead(self.cfg, name="visual_head")(visn)
        out["obj_logits"], out["attr_logits"], out["feat_pred"] = obj, attr, feat
        out["qa_logits"] = AnswerHead(self.cfg, name="answer_head")(pooled)
        return out


# ---------------------------------------------------------------------------
# losses — the LXMERT pretraining/finetune objectives the reference's
# processors prepare data for (vltk/processing/lang.py:25-137)
# ---------------------------------------------------------------------------


def masked_cross_entropy(logits, labels, ignore_id: int = -100):
    """CE averaged over positions where labels != ignore_id — the shared
    objective of masked LM, token classification, and span heads."""
    valid = labels != ignore_id
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


def masked_lm_loss(logits, labels, ignore_id: int = -100):
    """CE over positions where labels != ignore_id (the `masked_labels`
    written by masked_language_modeling, reference: processing/lang.py:101-137)."""
    return masked_cross_entropy(logits, labels, ignore_id)


def vqa_soft_loss(logits, target_scores):
    """BCE-with-logits against VQA soft scores, scaled by num answers
    (LXMERT convention; scores from soft_score, reference:
    utils/adapters.py:285-295)."""
    logits = logits.astype(jnp.float32)
    per = optax_sigmoid_bce(logits, target_scores)
    return jnp.mean(per) * logits.shape[-1]


def optax_sigmoid_bce(logits, targets):
    # stable sigmoid BCE; local to avoid importing optax in the model layer
    zeros = jnp.zeros_like(logits)
    relu = jnp.maximum(logits, zeros)
    return relu - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def matched_loss(logits, is_matched):
    """Cross-modality matching CE (matched_sentence_modeling targets,
    reference: processing/lang.py:81-98)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, is_matched[:, None], axis=-1))


def visual_feat_loss(pred, target, mask):
    """L2 regression on masked ROI features (masked_feature_modeling,
    reference: processing/lang.py:53-78). mask: (N, V) 1 = was masked."""
    err = jnp.sum((pred.astype(jnp.float32) - target) ** 2, axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(err * mask) / denom


def resize_num_qa_labels(params, num_answers: int, rng=None):
    """Re-size the answer head's output layer to ``num_answers``, keeping
    the overlapping rows (reference: ``resize_num_qa_labels`` during model
    init, vltk/abc/simple.py:135-236). Works on any params tree containing
    an ``answer_head/logit`` Dense."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, sep="/")
    kernel_key, bias_key = "answer_head/logit/kernel", "answer_head/logit/bias"
    if kernel_key not in flat:
        raise KeyError("params tree has no answer_head/logit")
    old_kernel = flat[kernel_key]
    old_bias = flat[bias_key]
    in_dim, old_n = old_kernel.shape
    if old_n == num_answers:
        return params
    if rng is None:
        rng = jax.random.PRNGKey(0)
    new_kernel = (
        jax.random.normal(rng, (in_dim, num_answers), old_kernel.dtype) * 0.02
    )
    new_bias = jnp.zeros((num_answers,), old_bias.dtype)
    keep = min(old_n, num_answers)
    flat[kernel_key] = new_kernel.at[:, :keep].set(old_kernel[:, :keep])
    flat[bias_key] = new_bias.at[:keep].set(old_bias[:keep])
    return tu.unflatten_dict(flat, sep="/")


def visual_label_loss(logits, labels, mask):
    """CE on masked-region object/attribute labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom
