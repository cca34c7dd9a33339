"""UniXcoder (RoBERTa-base encoder) as a Flax module for on-device embedding.

Replaces the reference's torch implementation
(`providers/unixcoder_provider.py:54-155`): RobertaModel run in encoder-only
mode with mode-token framing, whose sentence embedding is the
attention-mask-weighted mean-pool of the final hidden states. Config matches
`microsoft/unixcoder-base` (12 layers, 768 hidden, 12 heads, 3072 FFN,
vocab 51416); weights load from a local HF checkpoint directory when
available, otherwise deterministic random init keeps the full pipeline
runnable offline (embeddings are then lexically meaningless but shape- and
speed-faithful; the hash provider is the offline quality default).

TPU notes: everything is jit-compiled with static (batch, length) buckets;
matmuls run in bf16 with f32 accumulation via `preferred_element_type`
(MXU-friendly), LayerNorms and the final pool in f32.
"""

from __future__ import annotations

import dataclasses
import hashlib
import logging
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class UniXcoderConfig:
    vocab_size: int = 51416
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 1026
    type_vocab_size: int = 10
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1           # RoBERTa pad
    dtype: str = "bfloat16"         # compute dtype; params stay f32
    # None = auto. The vanilla path materializes a [B, H, L, L] score
    # tensor in HBM between the two attention matmuls (~1.6 GB/layer f32
    # at B=128 L=512); the Pallas flash kernel streams it through VMEM
    # instead — but measured SLOWER on v5e (369 vs 611 chunks/s, R3
    # phase A: head_dim 64 pads to the 128-lane MXU tile), so auto stays
    # on the vanilla einsum. LATTICE_FLASH_ATTN=0/1 overrides.
    fused_attention: bool | None = None
    # dtype of the materialized attention scores/probs. bfloat16 halves
    # the [B, H, L, L] HBM round-trip (the dominant non-matmul traffic);
    # the softmax itself still reduces through f32 inside the fusion.
    scores_dtype: str = "float32"
    # rematerialize each encoder layer on the backward pass (training
    # only): activations cost O(sqrt-ish) HBM instead of all 12 layers
    # of [B, L, H] (+[B, H, L, L] attention probs) — the standard
    # FLOPs-for-memory trade that unlocks large contrastive batches.
    # Inference ignores it (no backward pass, nothing to save).
    remat: bool = False
    # serve Q/K/V through one [H, 3H] matmul (fused params derived from
    # the standard tree via `fuse_qkv_params`; checkpoints stay 3-matmul).
    # Measured SLOWER on v5e (533 vs 604 chunks/s at B=128/L=512,
    # R3_TPU_RESULTS10 — XLA already runs the three shared-LHS matmuls
    # near this stack's efficiency floor), kept for A/B evidence.
    fused_qkv: bool = False
    # ops/attention.paired_attention: head-PAIR Pallas kernel sized for
    # head_dim 64 at L <= 512 — full-row softmax in VMEM (no [B,H,L,L]
    # HBM tensor, no online-softmax machinery, no transpose feeding it).
    # Measured v5e B=128/L=512: 730 vs 569 chunks/s (+28%, cosine
    # 0.999996 vs the einsum path; R4_TPU_RESULTS1) — auto = ON when the
    # backend is a real TPU (CPU keeps the einsum: interpret-mode Pallas
    # is orders slower there). LATTICE_PAIRED_ATTN=0/1 overrides.
    paired_attention: bool | None = None

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def _paired_enabled(cfg: "UniXcoderConfig") -> bool:
    import os
    env = os.environ.get("LATTICE_PAIRED_ATTN")
    if env is not None:
        return env == "1"
    if cfg.paired_attention is not None:
        return cfg.paired_attention
    # auto: the kernel won on chip (+28%, R4_TPU_RESULTS1); CPU runs
    # keep the einsum (interpret-mode Pallas is orders slower there)
    try:
        return jax.default_backend().lower() in ("tpu", "axon")
    except Exception:
        return False


def _flash_enabled(cfg: "UniXcoderConfig") -> bool:
    import os
    env = os.environ.get("LATTICE_FLASH_ATTN")
    if env is not None:
        return env == "1"
    if cfg.fused_attention is not None:
        return cfg.fused_attention
    # auto = vanilla: the flash kernel measured 369 vs 611 chunks/s on
    # v5e (R3 phase A — head_dim 64 pads to the 128-lane tile), so it is
    # strictly opt-in
    return False


class SelfAttention(nn.Module):
    config: UniXcoderConfig

    @nn.compact
    def __call__(self, hidden, mask):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            cfg.hidden_size, dtype=cfg.compute_dtype,
            param_dtype=jnp.float32, name=name)
        if cfg.fused_qkv:
            # one [H, 3H] projection instead of three [H, H] matmuls:
            # wider N amortizes weight DMA / launch overhead on the MXU.
            # Params are separate fused names — `fuse_qkv_params` derives
            # them from a standard tree, so checkpoints stay in the
            # 3-matmul layout.
            qkv = nn.Dense(3 * cfg.hidden_size, dtype=cfg.compute_dtype,
                           param_dtype=jnp.float32, name="qkv")(hidden)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense("query")(hidden)
            k = dense("key")(hidden)
            v = dense("value")(hidden)

        if (_paired_enabled(cfg) and not _flash_enabled(cfg)
                and head_dim == 64
                and cfg.num_heads % 2 == 0 and hidden.shape[1] >= 8):
            # an explicit flash opt-in (LATTICE_FLASH_ATTN=1 /
            # fused_attention=True) must win over the paired auto-default
            # or the A/B lever silently measures the paired kernel
            # (r4 review finding)
            # head-pair kernel consumes the projections in their native
            # [B, L, H*64] layout — no split/transpose at all
            from lattice_tpu.ops.attention import paired_attention
            ctx = paired_attention(
                q.astype(cfg.compute_dtype), k.astype(cfg.compute_dtype),
                v.astype(cfg.compute_dtype), mask,
                float(1.0 / np.sqrt(head_dim)),
                interpret=jax.default_backend() == "cpu")
            out = nn.Dense(cfg.hidden_size, dtype=cfg.compute_dtype,
                           param_dtype=jnp.float32, name="output")(
                ctx.astype(cfg.compute_dtype))
            return out

        def split(x):
            return x.reshape(x.shape[0], x.shape[1], cfg.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        if _flash_enabled(cfg) and hidden.shape[1] >= 128:
            # Pallas flash attention: the [L, L] score block lives in
            # VMEM only; padding masked via segment ids (pad tokens form
            # their own segment so real tokens never attend to them —
            # the same semantics as the additive [B,1,1,L] bias).
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )
            seg = mask.astype(jnp.int32)
            qh = jnp.transpose(q, (0, 2, 1, 3))      # [B, H, L, d]
            kh = jnp.transpose(k, (0, 2, 1, 3))
            vh = jnp.transpose(v, (0, 2, 1, 3))
            ctx = flash_attention(
                qh.astype(cfg.compute_dtype), kh.astype(cfg.compute_dtype),
                vh.astype(cfg.compute_dtype),
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=float(1.0 / np.sqrt(head_dim)), causal=False)
            ctx = jnp.transpose(ctx, (0, 2, 1, 3))   # [B, L, H, d]
        else:
            scores_dt = jnp.dtype(cfg.scores_dtype)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=scores_dt)
            scores = scores / np.sqrt(head_dim)
            # attention mask: [B, L] -> additive [B, 1, 1, L]
            bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
            # softmax reduces through f32 inside one fusion either way;
            # scores_dtype only sets what round-trips HBM
            probs = jax.nn.softmax(
                scores.astype(jnp.float32) + bias, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd",
                             probs.astype(cfg.compute_dtype), v,
                             preferred_element_type=jnp.float32)
        ctx = ctx.reshape(hidden.shape[0], hidden.shape[1], cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, dtype=cfg.compute_dtype,
                       param_dtype=jnp.float32, name="output")(
            ctx.astype(cfg.compute_dtype))
        return out


class EncoderLayer(nn.Module):
    config: UniXcoderConfig

    @nn.compact
    def __call__(self, hidden, mask):
        cfg = self.config
        attn_out = SelfAttention(cfg, name="attention")(hidden, mask)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="attention_norm")(
            hidden.astype(jnp.float32) + attn_out.astype(jnp.float32))
        hidden = hidden.astype(cfg.compute_dtype)
        inter = nn.Dense(cfg.intermediate_size, dtype=cfg.compute_dtype,
                         param_dtype=jnp.float32, name="intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, dtype=cfg.compute_dtype,
                       param_dtype=jnp.float32, name="output")(inter)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="output_norm")(
            hidden.astype(jnp.float32) + out.astype(jnp.float32))
        return hidden.astype(cfg.compute_dtype)


class UniXcoderEncoder(nn.Module):
    """Embeddings + N transformer layers + mean-pool sentence embedding."""

    config: UniXcoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        cfg = self.config
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        param_dtype=jnp.float32, name="word_embeddings")(
            input_ids)
        # RoBERTa positions: pad tokens get pad_id; others count from pad+1.
        positions = jnp.cumsum(attention_mask, axis=-1) * attention_mask \
            + cfg.pad_token_id
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       param_dtype=jnp.float32, name="position_embeddings")(
            positions)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="embeddings_norm")(word + pos)
        hidden = hidden.astype(cfg.compute_dtype)
        layer_cls = nn.remat(EncoderLayer) if cfg.remat else EncoderLayer
        for i in range(cfg.num_layers):
            hidden = layer_cls(cfg, name=f"layer_{i}")(hidden, attention_mask)
        # Mask-weighted mean-pool (reference `unixcoder_provider.py:137-155`).
        mask_f = attention_mask.astype(jnp.float32)[:, :, None]
        hidden_f = hidden.astype(jnp.float32)
        pooled = (hidden_f * mask_f).sum(axis=1) / jnp.maximum(
            mask_f.sum(axis=1), 1.0)
        return hidden, pooled


class UniXcoderModel:
    """Host-facing wrapper: params + jitted forward with length bucketing."""

    LENGTH_BUCKETS = (64, 128, 256, 512)

    def __init__(self, config: UniXcoderConfig | None = None,
                 weights_dir: str | Path | None = None, seed: int = 0,
                 finetune_dir: str | Path | None = None):
        self.config = config or UniXcoderConfig()
        self.module = UniXcoderEncoder(self.config)
        rng = jax.random.PRNGKey(seed)
        dummy_ids = jnp.zeros((1, 8), dtype=jnp.int32)
        dummy_mask = jnp.ones((1, 8), dtype=jnp.int32)
        self.params = self.module.init(rng, dummy_ids, dummy_mask)["params"]
        self.loaded_pretrained = False
        self.loaded_finetuned = False
        if weights_dir is not None:
            self.loaded_pretrained = self._load_hf_weights(Path(weights_dir))
        # identifies which weights produce embeddings, persisted in the index
        # manifest so a query-time encoder mismatch is detectable (ADVICE r1)
        self.weights_fingerprint = (
            "unixcoder-pretrained" if self.loaded_pretrained
            else f"unixcoder-random-seed{seed}")
        if finetune_dir is not None:
            # project-local checkpoint from `lattice train`
            # (models/finetune.py) overrides the base weights
            npz = Path(finetune_dir) / "finetuned_params.npz"
            if npz.is_file():
                try:
                    self.params = _load_flat_npz(npz, self.params)
                    self.loaded_finetuned = True
                    self.loaded_pretrained = True
                    digest = hashlib.blake2b(npz.read_bytes(),
                                             digest_size=8).hexdigest()
                    self.weights_fingerprint += f"+ft-{digest}"
                    logger.info("loaded fine-tuned checkpoint %s", npz)
                except (KeyError, ValueError) as exc:
                    logger.warning(
                        "fine-tuned checkpoint mismatch at %s (%s); "
                        "keeping base weights", npz, exc)
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, params, input_ids, attention_mask):
        _, pooled = self.module.apply({"params": params}, input_ids,
                                      attention_mask)
        return pooled

    def bucket_length(self, n: int) -> int:
        for b in self.LENGTH_BUCKETS:
            if n <= b:
                return b
        return self.LENGTH_BUCKETS[-1]

    def enable_fused_qkv(self) -> None:
        """Serve attention projections through one [H, 3H] matmul.

        Derives fused params from the standard tree (`fuse_qkv_params`)
        and swaps the module; numerics are identical up to matmul
        accumulation order. Call before `enable_bf16_inference` if both
        are wanted. Checkpoint loading/saving stays in the 3-matmul
        layout — call this after any weight load."""
        if self.config.fused_qkv:
            return
        self.config = dataclasses.replace(self.config, fused_qkv=True)
        self.module = UniXcoderEncoder(self.config)
        self.params = fuse_qkv_params(self.params, self.config.num_layers)
        self._forward = jax.jit(self._forward_impl)
        self.weights_fingerprint += "+qkvfused"

    def enable_bf16_inference(self) -> None:
        """Cast matrix params to bf16 in place for serving.

        The forward already computes in bf16 — keeping master params f32
        makes XLA re-convert every weight on every step and read 2x the
        param bytes from HBM. Vectors (LayerNorm scales/biases, biases)
        stay f32: the f32 LayerNorm path is a quality invariant. Opt-in:
        training and the torch-parity path keep full-precision masters.
        """
        self.params = jax.tree_util.tree_map(
            lambda x: (x.astype(jnp.bfloat16) if getattr(x, "ndim", 0) >= 2
                       else x),
            self.params)
        self.weights_fingerprint += "+bf16serve"

    def pin_serving_layouts(self, batch: int, length: int) -> bool:
        """AOT-compile the serving shape with AUTO layouts and re-place
        the param tree in the executable's preferred formats.

        The r3 xplane decode showed per-call param copies and an
        in-program transpose of every FFN output kernel (f32[3072,768]
        -> [768,3072] custom-call) — XLA relayouts arguments whose
        stored layout differs from what the compiled program wants.
        Compiling with `Format(Layout.AUTO)` lets XLA pick argument
        layouts for the program, and `device_put`ting the params into
        exactly those formats makes every subsequent call start from
        relayout-free inputs. Serving uses one (batch, length) bucket at
        a time; other shapes fall back to the regular jit cache.
        Returns False (and changes nothing) if the layout API is
        unavailable.
        """
        try:
            from jax.experimental.layout import Format, Layout
        except ImportError:                      # pragma: no cover
            return False
        ids = jnp.zeros((batch, length), jnp.int32)
        msk = jnp.ones((batch, length), jnp.int32)
        try:
            fwd = jax.jit(self._forward_impl,
                          in_shardings=Format(Layout.AUTO))
            compiled = fwd.lower(self.params, ids, msk).compile()
            arg_formats, _kw = compiled.input_formats
            self.params = jax.device_put(self.params, arg_formats[0])
        except Exception as exc:                 # noqa: BLE001
            logger.warning("layout pinning unavailable: %s", exc)
            return False
        # a fresh default jit keys its compile cache on the (now
        # XLA-preferred) argument layouts, so calls run relayout-free;
        # the AUTO-constrained executable itself only accepts
        # ShapeDtypeStructs and is discarded
        self._forward = jax.jit(self._forward_impl)
        return True

    def use_mesh(self, mesh) -> None:
        """Shard the encoder over a device mesh: batch rows over `data`
        (pjit batch-DP embedding, SURVEY §2.4 row 4 — replaces the
        reference's per-file embed loop `pipeline/orchestrator.py:630-656`),
        params tensor-parallel over `model` per `parallel/mesh.py` rules.
        XLA GSPMD inserts the tp all-reduces; pooled outputs come back
        row-sharded and gather on the host read."""
        from lattice_tpu.parallel.mesh import row_sharded, shard_params
        self.mesh = mesh
        self.params = shard_params(self.params, mesh)
        self._data_sharding = row_sharded(mesh)
        self._forward = jax.jit(self._forward_impl)

    @property
    def data_shards(self) -> int:
        mesh = getattr(self, "mesh", None)
        return int(mesh.shape["data"]) if mesh is not None else 1

    def encode_device(self, input_ids: np.ndarray,
                      attention_mask: np.ndarray) -> "jax.Array":
        """Pooled [B, H] embeddings LEFT ON DEVICE; pads L up to a static
        bucket (and B up to a multiple of the data axis when
        mesh-sharded). The device-resident form exists because a
        per-batch host readback of the pooled block costs ~30% of
        encoder throughput through the relay (798 vs 1130 chunks/s,
        R4_TPU_RESULTS2) — bulk ingestion hands this straight to
        `ChunkStore.add`, which quantizes on device anyway.

        Device-array inputs that already match a length bucket (and the
        data-axis batch multiple) skip the host pad path entirely — a
        host round-trip here re-uploads ~512 KB of ids+mask per batch,
        ~25 ms through a 20 MB/s link, and callers that tokenize once
        and loop (bulk ingestion, bench MFU loops) should pay it once."""
        if (isinstance(input_ids, jax.Array)
                and input_ids.ndim == 2
                and input_ids.dtype == jnp.int32
                and isinstance(attention_mask, jax.Array)
                and attention_mask.shape == input_ids.shape
                and input_ids.shape[1] == self.bucket_length(
                    input_ids.shape[1])
                and input_ids.shape[0] % self.data_shards == 0):
            mask_dev = jnp.asarray(attention_mask, jnp.int32)
            if self.data_shards > 1:
                # same invariant as the host path below: rows must be
                # row-sharded over the data axis, or a committed input
                # errors against the mesh-committed params (and an
                # uncommitted one silently runs replicated)
                input_ids = jax.device_put(input_ids, self._data_sharding)
                mask_dev = jax.device_put(mask_dev, self._data_sharding)
            return self._forward(self.params, input_ids, mask_dev)
        return self._encode_device_host(input_ids, attention_mask)

    def _encode_device_host(self, input_ids, attention_mask) -> "jax.Array":
        """Host pad path: numpy conversion + bucket/batch padding +
        upload. Split out so tests can pin that bucket-matched device
        inputs never fall through to it."""
        ids = np.asarray(input_ids, dtype=np.int32)
        mask = np.asarray(attention_mask, dtype=np.int32)
        if ids.ndim == 1:
            ids, mask = ids[None, :], mask[None, :]
        length = self.bucket_length(ids.shape[1])
        ids = ids[:, :length]
        mask = mask[:, :length]
        if ids.shape[1] < length:
            pad = length - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, pad)),
                         constant_values=self.config.pad_token_id)
            mask = np.pad(mask, ((0, 0), (0, pad)))
        b_in = ids.shape[0]
        shards = self.data_shards
        if b_in % shards:
            pad_b = shards - b_in % shards
            ids = np.pad(ids, ((0, pad_b), (0, 0)),
                         constant_values=self.config.pad_token_id)
            mask = np.pad(mask, ((0, pad_b), (0, 0)))
        ids_dev, mask_dev = jnp.asarray(ids), jnp.asarray(mask)
        if shards > 1:
            ids_dev = jax.device_put(ids_dev, self._data_sharding)
            mask_dev = jax.device_put(mask_dev, self._data_sharding)
        pooled = self._forward(self.params, ids_dev, mask_dev)
        return pooled[:b_in]

    def encode(self, input_ids: np.ndarray,
               attention_mask: np.ndarray) -> np.ndarray:
        """Pooled [B, H] embeddings on host (`encode_device` + readback)."""
        return np.asarray(self.encode_device(input_ids, attention_mask),
                          dtype=np.float32)

    # ---- HF weight loading (optional, offline-gated) -------------------

    def _load_hf_weights(self, weights_dir: Path) -> bool:
        """Load weights: our own fine-tune checkpoint
        (`finetuned_params.npz`, flat slash-joined tree paths from
        `models/finetune.py`) or a local `microsoft/unixcoder-base` torch
        checkpoint. Returns False (random init) when unavailable."""
        npz = weights_dir / "finetuned_params.npz"
        if npz.is_file():
            try:
                self.params = _load_flat_npz(npz, self.params)
                return True
            except (KeyError, ValueError) as exc:
                logger.warning("finetuned checkpoint mismatch (%s)", exc)
        state = _read_torch_state(weights_dir)
        if state is None:
            logger.warning("no loadable weights under %s; using random init",
                           weights_dir)
            return False
        try:
            self.params = _map_roberta_params(state, self.config, self.params)
            return True
        except KeyError as exc:
            logger.warning("weight mapping failed (%s); using random init", exc)
            return False


def fuse_qkv_params(params: dict, num_layers: int) -> dict:
    """Standard param tree -> fused-QKV layout ([H,3H] kernel per layer;
    concat order matches the `jnp.split(qkv, 3)` in SelfAttention)."""
    out = dict(params)
    for i in range(num_layers):
        layer = dict(out[f"layer_{i}"])
        attn = dict(layer["attention"])
        qkv_kernel = jnp.concatenate(
            [attn["query"]["kernel"], attn["key"]["kernel"],
             attn["value"]["kernel"]], axis=1)
        qkv_bias = jnp.concatenate(
            [attn["query"]["bias"], attn["key"]["bias"],
             attn["value"]["bias"]])
        fused_attn = {"qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                      "output": attn["output"]}
        layer["attention"] = fused_attn
        out[f"layer_{i}"] = layer
    return out


def _load_flat_npz(path: Path, params: dict) -> dict:
    """Restore a param tree from the finetune driver's flat npz checkpoint."""
    flat = np.load(path)

    def fill(tree: dict, prefix: str) -> dict:
        out = {}
        for key, value in tree.items():
            name = f"{prefix}/{key}" if prefix else key
            if isinstance(value, dict):
                out[key] = fill(value, name)
            else:
                if name not in flat.files:
                    raise KeyError(name)
                stored = flat[name]
                if stored.shape != value.shape:
                    raise ValueError(
                        f"{name}: shape {stored.shape} != {value.shape}")
                out[key] = jnp.asarray(stored)
        return out

    return fill(params, "")


def _read_torch_state(weights_dir: Path) -> dict | None:
    for name in ("model.safetensors",):
        path = weights_dir / name
        if path.is_file():
            try:
                from safetensors.numpy import load_file
                return dict(load_file(str(path)))
            except Exception:
                pass
    for name in ("pytorch_model.bin",):
        path = weights_dir / name
        if path.is_file():
            try:
                import torch
                state = torch.load(str(path), map_location="cpu",
                                   weights_only=True)
                return {k: v.numpy() for k, v in state.items()}
            except Exception:
                pass
    return None


def _map_roberta_params(state: dict, cfg: UniXcoderConfig, params: dict) -> dict:
    """HF `roberta.*` names -> this module's param tree."""
    def g(key: str) -> np.ndarray:
        for prefix in ("roberta.", "", "model."):
            k = prefix + key
            if k in state:
                return np.asarray(state[k])
        raise KeyError(key)

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    out["word_embeddings"]["embedding"] = g("embeddings.word_embeddings.weight")
    pos_table = g("embeddings.position_embeddings.weight")
    # HF RoBERTa adds token_type_embeddings[0] to EVERY position (token
    # type ids are all zero in encoder-only use); this module has no type
    # table, so fold that constant row into the position table — summed
    # pre-LayerNorm, the result is bit-identical. Skipping this fold was a
    # silent parity break vs torch (caught by the torch-parity test).
    try:
        pos_table = pos_table + g(
            "embeddings.token_type_embeddings.weight")[0][None, :]
    except KeyError:
        pass
    out["position_embeddings"]["embedding"] = pos_table
    out["embeddings_norm"]["scale"] = g("embeddings.LayerNorm.weight")
    out["embeddings_norm"]["bias"] = g("embeddings.LayerNorm.bias")
    for i in range(cfg.num_layers):
        hf = f"encoder.layer.{i}."
        layer = out[f"layer_{i}"]
        attn = layer["attention"]
        for ours, theirs in (("query", "attention.self.query"),
                             ("key", "attention.self.key"),
                             ("value", "attention.self.value"),
                             ("output", "attention.output.dense")):
            attn[ours]["kernel"] = g(hf + theirs + ".weight").T
            attn[ours]["bias"] = g(hf + theirs + ".bias")
        layer["attention_norm"]["scale"] = g(hf + "attention.output.LayerNorm.weight")
        layer["attention_norm"]["bias"] = g(hf + "attention.output.LayerNorm.bias")
        layer["intermediate"]["kernel"] = g(hf + "intermediate.dense.weight").T
        layer["intermediate"]["bias"] = g(hf + "intermediate.dense.bias")
        layer["output"]["kernel"] = g(hf + "output.dense.weight").T
        layer["output"]["bias"] = g(hf + "output.dense.bias")
        layer["output_norm"]["scale"] = g(hf + "output.LayerNorm.weight")
        layer["output_norm"]["bias"] = g(hf + "output.LayerNorm.bias")
    return out
