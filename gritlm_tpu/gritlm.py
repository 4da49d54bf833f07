"""GritLM — unified embedding + generation API (TPU/JAX).

Same capabilities as the reference `gritlm` pip package (gritlm/gritlm.py):
modes unified/embedding/generative, 4 pooling methods, instruction masking,
embed_eos, optional projection head, KV-cache capture, encode_queries/corpus,
generate. Redesigned around jit: tokenized batches are bucketed to a small
set of static shapes, the encode step is one compiled function per bucket.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from gritlm_tpu.config import ModelConfig
from gritlm_tpu.models.transformer import (
    KVCache,
    forward,
    init_cache,
    init_params,
)
from gritlm_tpu.generate import GenerateResult, generate, make_cache_for_prompt
from gritlm_tpu.ops.pooling import POOLING_METHODS, mask_instruction, pool
from gritlm_tpu.tokenizer import load_tokenizer

ATTN_MODES = ("bbcc", "cccc", "bb", "cc")


def _bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket ≥ n; beyond the largest bucket, round up to the flash
    k-block size (1024) so cache/attention shapes never need re-padding."""
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 1024) * 1024


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "pooling_method", "causal", "normalized", "has_projection"),
)
def _encode_step(
    params: dict,
    projection: Optional[dict],
    cfg: ModelConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    pool_mask: jax.Array,
    *,
    pooling_method: str,
    causal: bool,
    normalized: bool,
    has_projection: bool,
) -> jax.Array:
    if not has_projection and pooling_method in ("mean", "weightedmean"):
        # fused epilogue: final RMSNorm + masked mean + L2 normalize in one
        # pass over the residual stream (ops/fused_pool) — skips two HBM
        # sweeps of the largest encode activation
        from gritlm_tpu.ops.fused_pool import fused_norm_mean_pool

        hidden, _, _ = forward(
            params, cfg, input_ids, attention_mask=attention_mask,
            causal=causal, final_norm=False,
        )
        return fused_norm_mean_pool(
            hidden, params["final_ln"]["scale"], pool_mask,
            eps=cfg.rms_norm_eps, method=pooling_method,
            normalized=normalized,
        )
    hidden, _, _ = forward(
        params, cfg, input_ids, attention_mask=attention_mask, causal=causal
    )
    if has_projection:
        hidden = hidden @ projection["kernel"] + projection["bias"]
    emb = pool(hidden, pool_mask, pooling_method)  # fp32
    if normalized:
        emb = emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    return emb


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "pooling_method", "causal", "normalized",
                     "has_projection", "cache_len", "quant"),
)
def _encode_step_with_cache(
    params: dict,
    projection: Optional[dict],
    cfg: ModelConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    pool_mask: jax.Array,
    *,
    pooling_method: str,
    causal: bool,
    normalized: bool,
    has_projection: bool,
    cache_len: int,
    quant: bool = False,
):
    cache = init_cache(cfg, input_ids.shape[0], cache_len, quant=quant)
    hidden, cache, _ = forward(
        params, cfg, input_ids,
        attention_mask=attention_mask, causal=causal, cache=cache,
    )
    if has_projection:
        hidden = hidden @ projection["kernel"] + projection["bias"]
    emb = pool(hidden, pool_mask, pooling_method)
    if normalized:
        emb = emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    return emb, cache


class GritLM:
    """Unified embedding+generation model.

    Construction is explicit (params/config/tokenizer) or from an HF-style
    checkpoint directory via `from_pretrained` (models/loader.py).
    """

    def __init__(
        self,
        config: ModelConfig,
        params: Optional[dict] = None,
        tokenizer=None,
        *,
        mode: str = "unified",  # unified | embedding | generative
        pooling_method: str = "mean",
        normalized: bool = True,
        projection: Optional[int] = None,
        embed_eos: str = "",
        attn: str = "bbcc",
        seed: int = 0,
        seq_buckets: Sequence[int] = (64, 128, 256, 512, 1024, 2048, 4096),
        mesh=None,
        kv_quant: bool = False,  # int8 KV cache for generation (halves
        # decode cache bandwidth + doubles cache capacity; opt-in)
        weight_quant: bool | int = False,  # w8a16 / w4a16 serving: True or 8
        # → int8 weights + lm head (halves the per-decode-step parameter
        # stream); 4 → group-wise int4 via the fused Pallas matmul
        # (quarters it). Opt-in.
    ) -> None:
        if attn is not None and attn not in ATTN_MODES:
            raise ValueError(
                f"Mixed attention not supported: {attn}. Use one of {ATTN_MODES}"
            )
        if pooling_method not in POOLING_METHODS:
            raise NotImplementedError(f"Unknown pooling method: {pooling_method}")
        self.config = config
        self.mode = mode
        self.pooling_method = pooling_method
        self.normalized = normalized
        self.embed_eos = embed_eos
        self.attn = attn
        self.seq_buckets = tuple(seq_buckets)
        self.kv_quant = kv_quant
        self.tokenizer = tokenizer or load_tokenizer(None)

        key = jax.random.PRNGKey(seed)
        if params is None:
            params = init_params(config, key, with_lm_head=(mode != "embedding"))
        if weight_quant:
            from gritlm_tpu.training.quant import quantize_for_serving

            # layer kernels + lm head only; embed/projection stay dense
            bits = 4 if weight_quant == 4 else 8
            params = quantize_for_serving(params, bits=bits)

        # Multi-chip inference (the reference's DataParallel embedding path,
        # gritlm/gritlm.py:71-75, SURVEY §2.8 row 1): params sharded per the
        # GSPMD rules, encode batches sharded over (data, fsdp) — XLA inserts
        # any tp/fsdp collectives. mesh=None → single default device.
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gritlm_tpu.parallel.mesh import BATCH_AXES
            from gritlm_tpu.parallel.sharding import param_partition_specs

            pspecs = param_partition_specs(params)
            params = jax.device_put(
                params,
                jax.tree_util.tree_map(
                    lambda s: NamedSharding(mesh, s), pspecs,
                    is_leaf=lambda x: isinstance(x, P),
                ),
            )
            self._batch_sharding = NamedSharding(mesh, P(BATCH_AXES))
        self.params = params

        self.projection = None
        if isinstance(params, dict) and "projection" in params:
            trained = params.pop("projection")  # head shipped in the checkpoint
            if projection is None or trained["kernel"].shape[1] == projection:
                self.projection = trained
                projection = None  # trained head wins over a matching request
            else:
                import warnings

                warnings.warn(
                    f"checkpoint has a trained projection head "
                    f"(dim {trained['kernel'].shape[1]}) but projection="
                    f"{projection} was requested — using a fresh random head"
                )
        if projection is not None:
            kp, kb = jax.random.split(jax.random.PRNGKey(seed + 1))
            lim = (6.0 / (config.hidden_size + projection)) ** 0.5
            self.projection = {
                "kernel": jax.random.uniform(
                    kp, (config.hidden_size, projection), jnp.float32, -lim, lim
                ).astype(config.jnp_dtype),
                "bias": jnp.zeros((projection,), config.jnp_dtype),
            }

    # ------------------------------------------------------------------ utils

    @classmethod
    def from_pretrained(cls, path: str, dtype=None, **kwargs) -> "GritLM":
        """`dtype` overrides the checkpoint's torch_dtype (e.g. 'float16'
        keeps fp16 numerics instead of the bfloat16 promotion)."""
        from gritlm_tpu.models.loader import load_checkpoint

        cfg, params = load_checkpoint(
            path, with_lm_head=(kwargs.get("mode", "unified") != "embedding"),
            dtype=dtype,
        )
        tok = load_tokenizer(path)
        return cls(cfg, params=params, tokenizer=tok, **kwargs)

    @property
    def embed_causal(self) -> bool:
        return not (self.attn is not None and self.attn[:2] == "bb")

    # ----------------------------------------------------------------- encode

    def encode_queries(self, queries: Union[List[str], str], **kwargs) -> np.ndarray:
        return self.encode(queries, **kwargs)

    def encode_corpus(
        self, corpus: Union[List[str], str, List[Dict[str, str]]], **kwargs
    ) -> np.ndarray:
        if isinstance(corpus, dict):
            corpus = [corpus]
        if isinstance(corpus, list) and corpus and isinstance(corpus[0], dict):
            corpus = [
                d["title"] + " " + d["text"] if "title" in d else d["text"]
                for d in corpus
            ]
        return self.encode(corpus, **kwargs)

    def encode(
        self,
        sentences: Union[List[str], str],
        batch_size: int = 256,
        max_length: int = 512,
        instruction: str = "",
        embed_instruction: bool = False,
        get_cache: bool = False,
        convert_to_tensor: bool = False,
        add_special_tokens: bool = True,
    ):
        """Embed sentences (reference semantics: gritlm/gritlm.py:92-176).

        Prompt = instruction + sentence + embed_eos; instruction tokens are
        excluded from mean/weightedmean pooling unless embed_instruction.
        """
        input_was_string = isinstance(sentences, str)
        if input_was_string:
            sentences = [sentences]
        if len(sentences) == 0:
            dim = (
                self.projection["kernel"].shape[1]
                if self.projection is not None
                else self.config.hidden_size
            )
            return np.zeros((0, dim), np.float32)

        mask_instr = bool(
            instruction and not embed_instruction and "mean" in self.pooling_method
        )

        all_embeddings, all_kv_caches = [], None
        for start in range(0, len(sentences), batch_size):
            batch = [
                instruction + s + self.embed_eos
                for s in sentences[start : start + batch_size]
            ]
            enc = self.tokenizer(
                batch, max_length=max_length, add_special_tokens=add_special_tokens
            )
            ids, mask = enc["input_ids"], enc["attention_mask"]
            blen = _bucket(ids.shape[1], self.seq_buckets)
            if blen <= self.seq_buckets[-1]:
                blen = min(blen, max_length)
            if ids.shape[1] < blen:
                padw = blen - ids.shape[1]
                ids = np.pad(ids, ((0, 0), (0, padw)),
                             constant_values=self.tokenizer.pad_token_id)
                mask = np.pad(mask, ((0, 0), (0, padw)))
            pmask = mask.copy()
            if mask_instr:
                # per-row instruction lengths with BPE boundary-merge
                # detect-and-correct (tokenizer.instruction_token_lens)
                from gritlm_tpu.tokenizer import instruction_token_lens

                ilens = instruction_token_lens(
                    self.tokenizer, instruction, ids, mask,
                    add_special_tokens=add_special_tokens,
                )
                pmask = pmask * (
                    np.arange(ids.shape[1])[None, :] >= ilens[:, None]
                ).astype(pmask.dtype)
            n_rows = ids.shape[0]
            if self._batch_sharding is not None:
                # pad rows to the mesh's batch-shard count, shard over devices
                padr = -n_rows % self._batch_shards()
                if padr:
                    ids = np.pad(ids, ((0, padr), (0, 0)),
                                 constant_values=self.tokenizer.pad_token_id)
                    mask = np.pad(mask, ((0, padr), (0, 0)))
                    # keep one valid token so pooling masks are non-empty
                    mask[n_rows:, 0] = 1
                    pmask = np.pad(pmask, ((0, padr), (0, 0)))
                    pmask[n_rows:, 0] = 1
                put = lambda x: jax.device_put(x, self._batch_sharding)
            else:
                put = jnp.asarray
            ids_j = put(ids)
            mask_j = put(mask)
            pmask_j = put(pmask)
            kw = dict(
                pooling_method=self.pooling_method,
                causal=self.embed_causal,
                normalized=self.normalized,
                has_projection=self.projection is not None,
            )
            if get_cache:
                assert all_kv_caches is None, "Can only get cache for one batch"
                emb, all_kv_caches = _encode_step_with_cache(
                    self.params, self.projection, self.config,
                    ids_j, mask_j, pmask_j, cache_len=blen,
                    quant=self.kv_quant, **kw,
                )
                if all_kv_caches.k.shape[1] != n_rows:  # drop mesh pad rows
                    c = all_kv_caches
                    all_kv_caches = KVCache(
                        k=c.k[:, :n_rows],
                        v=c.v[:, :n_rows],
                        mask=c.mask[:n_rows],
                        length=c.length,
                        k_scale=c.k_scale[:, :n_rows] if c.quantized else None,
                        v_scale=c.v_scale[:, :n_rows] if c.quantized else None,
                    )
            else:
                emb = _encode_step(
                    self.params, self.projection, self.config,
                    ids_j, mask_j, pmask_j, **kw,
                )
            emb = emb[:n_rows]
            all_embeddings.append(
                emb if convert_to_tensor else np.asarray(jax.device_get(emb), np.float32)
            )

        out = (
            jnp.concatenate(all_embeddings, axis=0)
            if convert_to_tensor
            else np.concatenate(all_embeddings, axis=0)
        )
        if input_was_string:
            out = out[0]
        if get_cache:
            return out, all_kv_caches
        return out

    # --------------------------------------------------------------- generate

    def _batch_shards(self) -> int:
        return int(np.prod([
            self.mesh.shape[a] for a in self._batch_sharding.spec[0]
        ]))

    def required_cache_len(
        self, prompt_tokens: int, cache_len: int, max_new_tokens: int
    ) -> int:
        """Slot count generate_from_ids will require for a prompt of
        `prompt_tokens` continuing a cache of `cache_len` valid slots — the
        single source of the bucket+align sizing formula, so callers (e.g.
        RAGEngine's fused cache concat) can pre-size buffers such that
        pad_cache_to is a no-op."""
        from gritlm_tpu.generate import align_cache_len

        return align_cache_len(
            cache_len + _bucket(prompt_tokens, self.seq_buckets) + max_new_tokens
        )

    def generate_from_ids(
        self,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        *,
        cache: Optional[KVCache] = None,
        max_new_tokens: int = 16,
        min_new_tokens: int = 0,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        speculative: bool = False,
        spec_ngram: int = 3,
        spec_k: int = 7,
    ) -> GenerateResult:
        if speculative and (temperature != 0.0 or min_new_tokens > 0):
            raise ValueError(
                "speculative decoding is greedy-only (temperature=0.0, "
                "min_new_tokens=0); rejected proposals are replaced by the "
                "model's own argmax, which has no sampling analogue here"
            )
        # bucket the prompt length so varied-length prompts reuse compiled
        # programs (right-padding is handled by position/mask accounting in
        # generate.py) — same trick as encode's seq_buckets
        input_ids = np.asarray(input_ids)
        attention_mask = np.asarray(attention_mask)
        S = input_ids.shape[1]
        blen = _bucket(S, self.seq_buckets)
        if input_ids.shape[1] < blen:
            padw = blen - input_ids.shape[1]
            input_ids = np.pad(input_ids, ((0, 0), (0, padw)),
                               constant_values=self.tokenizer.pad_token_id)
            attention_mask = np.pad(attention_mask, ((0, 0), (0, padw)))

        # Multi-chip generation (the decode analogue of the reference's
        # DataParallel embedding path): rows padded to the mesh's batch-shard
        # count, prompt + KV cache sharded over (data, fsdp); pad rows decode
        # garbage that is sliced off below.
        n_rows = input_ids.shape[0]
        put_batch = jnp.asarray
        put_cache = None
        if self._batch_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            padr = -n_rows % self._batch_shards()
            if padr:
                input_ids = np.pad(input_ids, ((0, padr), (0, 0)),
                                   constant_values=self.tokenizer.pad_token_id)
                attention_mask = np.pad(attention_mask, ((0, padr), (0, 0)))
                attention_mask[n_rows:, 0] = 1  # one live token per pad row
                if cache is not None:
                    def pad_rows(x):  # row axis 1 for [L,B,...] leaves
                        return jnp.concatenate(
                            [x, jnp.zeros(
                                x.shape[:1] + (padr,) + x.shape[2:], x.dtype
                            )], axis=1)

                    cache = KVCache(
                        k=pad_rows(cache.k),
                        v=pad_rows(cache.v),
                        mask=jnp.concatenate(
                            [cache.mask,
                             jnp.zeros((padr,) + cache.mask.shape[1:],
                                       cache.mask.dtype)], axis=0),
                        length=cache.length,
                        k_scale=(pad_rows(cache.k_scale)
                                 if cache.quantized else None),
                        v_scale=(pad_rows(cache.v_scale)
                                 if cache.quantized else None),
                    )
            batch_axes = self._batch_sharding.spec[0]
            row1 = NamedSharding(self.mesh, P(None, batch_axes))
            put_batch = lambda x: jax.device_put(x, self._batch_sharding)
            put_cache = lambda c: KVCache(
                k=jax.device_put(c.k, row1),
                v=jax.device_put(c.v, row1),
                mask=jax.device_put(c.mask, self._batch_sharding),
                length=jax.device_put(c.length, NamedSharding(self.mesh, P())),
                k_scale=(jax.device_put(c.k_scale, row1)
                         if c.quantized else None),
                v_scale=(jax.device_put(c.v_scale, row1)
                         if c.quantized else None),
            )

        spec_extra = 0
        if speculative:
            from gritlm_tpu.spec_decode import spec_cache_extra

            spec_extra = spec_cache_extra(
                max_new_tokens, spec_k, input_ids.shape[0]
            )
        if cache is None:
            cache = make_cache_for_prompt(
                self.config, input_ids.shape[0], input_ids.shape[1],
                max_new_tokens, extra=spec_extra, quant=self.kv_quant,
            )
        else:
            from gritlm_tpu.generate import align_cache_len, pad_cache_to

            # same formula as required_cache_len (prompt already bucketed,
            # and _bucket is idempotent on bucket values)
            cache = pad_cache_to(cache, align_cache_len(
                self.required_cache_len(
                    input_ids.shape[1], int(cache.length), max_new_tokens
                ) + spec_extra
            ))
        if put_cache is not None:
            cache = put_cache(cache)
        if speculative:
            from gritlm_tpu.spec_decode import generate_speculative

            res = generate_speculative(
                self.params, self.config,
                put_batch(jnp.asarray(input_ids)),
                put_batch(jnp.asarray(attention_mask)), cache,
                max_new_tokens=max_new_tokens, ngram=spec_ngram, k=spec_k,
                eos_id=self.tokenizer.eos_token_id,
                pad_id=self.tokenizer.pad_token_id,
            )
        else:
            res = generate(
                self.params, self.config,
                put_batch(jnp.asarray(input_ids)),
                put_batch(jnp.asarray(attention_mask)), cache,
                jax.random.PRNGKey(seed),
                max_new_tokens=max_new_tokens, min_new_tokens=min_new_tokens,
                temperature=temperature, top_k=top_k, top_p=top_p,
                eos_id=self.tokenizer.eos_token_id, pad_id=self.tokenizer.pad_token_id,
            )
        if res.tokens.shape[0] != n_rows:  # drop mesh pad rows
            c = res.cache
            res = GenerateResult(
                tokens=res.tokens[:n_rows], num_valid=res.num_valid[:n_rows],
                # trim the cache rows too (like encode does) so res.cache is
                # reusable in a follow-up call — a padded cache would be
                # re-padded against a differently-padded prompt and diverge
                cache=KVCache(
                    k=c.k[:, :n_rows], v=c.v[:, :n_rows],
                    mask=c.mask[:n_rows], length=c.length,
                    k_scale=c.k_scale[:, :n_rows] if c.quantized else None,
                    v_scale=c.v_scale[:, :n_rows] if c.quantized else None,
                ),
            )
        return res

    def generate(
        self,
        prompts: Union[str, List[str]],
        *,
        max_new_tokens: int = 16,
        min_new_tokens: int = 0,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        max_length: int = 2048,
        cache: Optional[KVCache] = None,
        add_special_tokens: bool = True,
        seed: int = 0,
        speculative: bool = False,
        spec_ngram: int = 3,
        spec_k: int = 7,
    ) -> Union[str, List[str]]:
        was_str = isinstance(prompts, str)
        if was_str:
            prompts = [prompts]
        enc = self.tokenizer(
            prompts, max_length=max_length, add_special_tokens=add_special_tokens
        )
        res = self.generate_from_ids(
            enc["input_ids"], enc["attention_mask"],
            cache=cache, max_new_tokens=max_new_tokens,
            min_new_tokens=min_new_tokens,
            temperature=temperature, top_k=top_k, top_p=top_p, seed=seed,
            speculative=speculative, spec_ngram=spec_ngram, spec_k=spec_k,
        )
        toks = np.asarray(res.tokens)
        nv = np.asarray(res.num_valid)
        outs = [
            self.tokenizer.decode(toks[i, : nv[i]], skip_special_tokens=True)
            for i in range(len(prompts))
        ]
        return outs[0] if was_str else outs
