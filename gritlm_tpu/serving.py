"""Continuous-batching serving engine: ragged requests, full decode batches.

The reference has no serving layer at all — its decode path is lockstep HF
`generate` over one fixed batch (gritlm/gritlm.py:34, rag/eval.py:296-302):
every request in a batch waits for the longest one, and a new request waits
for the whole batch. This module is the TPU-native extension for production
serving (Orca/vLLM-style iteration-level scheduling):

  * a fixed pool of B cache slots, each holding an independent request at
    an independent length (`forward(row_offsets=...)` — every decode step
    appends each row's K/V at its OWN write pointer);
  * per-request prefill into a free slot (bucketed prompt lengths, so a
    handful of compiled programs cover any arrival);
  * one jitted decode chunk for the whole pool; finished rows (EOS /
    max_new_tokens) free their slot and the next queued request is
    admitted — the decode batch stays full under ragged arrival.

Works with every serving weight/cache format: bf16, int8 KV
(`kv_quant=True`), w8a16 / w4a16 weights (pass pre-quantized params —
training/quant.quantize_for_serving).

Design notes (TPU):
  - ALL decode state is device-resident and threaded through one carry
    (next-token ids, KV pool, per-row write pointers, active flags, token
    budgets). The host scheduler only touches the carry through two
    compiled programs (insert-after-prefill, decode-chunk), so chunks
    chain on device with no host round-trip between them.
  - The decode chunk is a `lax.scan` over `chunk_size` tokens with
    on-device EOS/budget masking (rows that finish mid-chunk go inactive
    and stop appending). One host<->device round-trip per token would put
    dispatch latency on the critical path of every token (measured 150+ms
    per step through a remote-TPU tunnel); chunking amortizes it.
  - `overlap=True` (default) pipelines host and device: chunk k+1 is
    DISPATCHED before chunk k's results are read, and results stream back
    via `copy_to_host_async` while the device computes — the fetch is a
    memcpy of data that already landed, so the device queue never drains.
    The cost is that a slot freed in chunk k is only re-admitted at chunk
    k+2 (<=2*chunk_size idle slot-steps per completion). `overlap=False`
    gives strict admit-before-decode scheduling for deterministic tests.
  - `adaptive_chunk=True` shortens dispatched chunks toward the earliest
    possible completion while requests queue for a slot (the host knows
    every row's remaining token budget exactly), shrinking the idle-slot
    window above from ~2*chunk_size steps to a few. Default OFF: through
    a remote-runtime tunnel each dispatch costs ~3-16 ms against ~3 ms
    of device time per decode step at B=8, so the extra dispatches cost
    more than the reclaimed slot-steps (measured v5e ragged24: 986 vs
    1133 tok/s dense, 950 vs 1164 paged). On a locally-attached host
    (~100 us dispatch) the tradeoff reverses — flip it on there.
    Either way chunks that can emit nothing are skipped, and scheduling
    never changes tokens (parity is schedule-invariant).
  - Admission prefills same-bucket requests as one batch (rows padded to
    a power of two to bound the executable count); the first sampled
    token stays on device and is folded into the carry by the insert
    program, so admission never blocks the pipeline either — first
    tokens are read lazily at the next result-processing point.
  - `paged=True` swaps the dense B x max_len pool for a shared PAGE pool
    (models/transformer.PagedKVCache + ops/paged_attention.py): HBM
    scales with the tokens requests actually reserve, not the worst
    case, and admission is bounded by free pages instead of max-length
    slots. Prefill still runs dense per bucket; the insert program
    scatters the rows into their allocated pages. `register_prefix`
    pins a precomputed cache (e.g. a RAG document) into pool pages ONCE;
    any number of concurrent requests then reference those pages
    read-only through their page tables (zero-copy sharing — the
    per-request tail starts page-aligned after the prefix, so shared
    pages are never written and no copy-on-write machinery is needed).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gritlm_tpu.config import ModelConfig
from gritlm_tpu.models.transformer import (
    KVCache,
    forward,
    init_cache,
    init_paged_cache,
    logits_from_hidden,
)


@dataclass
class Request:
    """One generation request (token-id level; tokenize outside).

    `doc_cache` admits the request as a CONTINUATION of a precomputed KV
    cache (the RAG doc-cache serving flow — reference rag/eval.py:237-302
    does this lockstep-only): a host tuple `(k, v, w, k_scale, v_scale)`
    in the RAGEngine doc-store entry format (k/v `[L, w, Kv*Dh]`, `w` the
    valid token count, scales `[L, Kv, w]` or None). The prompt then
    prefills BEHIND the cached document (positions continue at w) and the
    request decodes like any other — so one pool serves cached-doc RAG
    queries and plain generation side by side.

    `prefix` (paged pools only) continues a cache the engine has pinned
    into shared pages via `register_prefix(key, entry)` — the zero-copy
    doc-cache serving flow: N concurrent requests on the same document
    read the SAME physical pages.

    Sampling (`temperature > 0`, engine built with `sampling=True`): each
    request draws from its OWN key chain `fold_in(PRNGKey(seed), n)` at
    its n-th generated token, so its output is deterministic in `seed`
    and INDEPENDENT of scheduling — slot assignment, chunk size, overlap,
    and pool co-tenants cannot change a request's tokens. `top_k`/`top_p`
    filter per row (generate.py nucleus semantics, value-threshold ties).
    temperature == 0.0 rows stay exactly greedy."""

    input_ids: List[int]
    max_new_tokens: int = 16
    request_id: Optional[str] = None
    doc_cache: Optional[tuple] = None
    prefix: Optional[object] = None
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0
    # speculative pools: extra lookup-corpus tokens PRECEDING input_ids
    # (the cached document's token ids for doc_cache/prefix rows — their
    # KV comes from the cache, but their text is what extractive answers
    # quote, so seeding the prompt-lookup corpus with them is where
    # speculation pays). Ignored by non-speculative engines.
    hist_ids: Optional[List[int]] = None
    # multi-adapter pools (ServingEngine(adapters=...)): which LoRA
    # fine-tune this request decodes with; None = the plain base model
    adapter: Optional[str] = None
    # admission priority: higher admits first; FIFO within a level
    priority: int = 0


@dataclass
class Completion:
    request_id: Optional[str]
    token_ids: List[int]  # generated ids, EOS included when emitted
    finish_reason: str  # "eos" | "length" | "cancelled"
    prompt_len: int = 0


@dataclass
class EmbedRequest:
    """One embedding request in the SAME pool as generation — unified
    serving of the model's two capabilities (the GritLM thesis: one set
    of weights does both; reference gritlm/gritlm.py:92-176 vs :262-296
    can only run them as separate batch scripts).

    Token-id level like Request: `input_ids` is the full prompt
    (instruction + text + embed_eos tokens, unpadded); the leading
    `instr_len` tokens are excluded from mean/weightedmean pooling
    (reference instruction masking, gritlm/gritlm.py:144-153). Pass
    instr_len=0 to embed the instruction too (embed_instruction=True
    semantics). Embedding batches dispatch between decode chunks — one
    same-bucket group per scheduler step, so in-flight generations'
    time-between-tokens stays bounded — and run the SAME jitted program
    as GritLM.encode (gritlm._encode_step), so pool embeddings are
    bitwise identical to the offline encoder's."""

    input_ids: List[int]
    instr_len: int = 0
    request_id: Optional[str] = None
    priority: int = 0
    # multi-adapter pools: embed with this LoRA fine-tune (None = base)
    adapter: Optional[str] = None


@dataclass
class EmbedCompletion:
    request_id: Optional[str]
    embedding: np.ndarray  # [hidden] float32, L2-normalized by default


@dataclass
class _Slot:
    request: Request
    generated: List[int] = field(default_factory=list)
    # (device firsts array, row) — the prefill's first sampled token,
    # fetched lazily so admission never blocks on the device
    first_src: Optional[Tuple[jax.Array, int]] = None
    # decode steps dispatched for this row so far (host-exact: budget
    # termination is deterministic, so max_new-1-dispatched is a sound
    # upper bound on tokens the row can still emit; EOS only ends rows
    # earlier). Drives adaptive chunk shortening.
    dispatched: int = 0


@dataclass
class _Pending:
    """A chunked prefill in flight: the request holds its reserved slot
    (and pages) while its prompt streams in `prefill_chunk`-token chunks
    between decode chunks."""
    request: Request
    slot: int
    cache: object  # [.., 1, bucket, ..] row KVCache, filled incrementally
    bucket: int
    filled: int = 0
    first: Optional[jax.Array] = None  # last chunk's next-token, [1]
    pids: Optional[List[int]] = None  # reserved pages (paged pools)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


def _sample_rows(logits: jax.Array, samp: tuple) -> jax.Array:
    """Per-ROW sampling over [R, V] logits: each row has its own
    (temperature, top_k, top_p, base key, generation index). One
    descending sort serves both filters — top-k keeps values >= the
    k-th, top-p keeps values >= the nucleus-cutoff rank's (the
    generate.py nucleus rule, ties resolved by value so equal logits
    are kept together). temperature == 0 rows return pure argmax."""
    temps, tks, tps, keys, n_gen = samp
    V = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lg = logits.astype(jnp.float32) / jnp.maximum(temps, 1e-6)[:, None]
    svals = jnp.sort(lg, axis=-1)[:, ::-1]  # [R, V] descending
    kk = jnp.clip(jnp.where(tks > 0, tks, V), 1, V)
    k_th = jnp.take_along_axis(svals, (kk - 1)[:, None], axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(svals, axis=-1), axis=-1)
    cut = jnp.minimum(
        jnp.sum((cum < tps[:, None]).astype(jnp.int32), axis=-1), V - 1
    )
    p_th = jnp.take_along_axis(svals, cut[:, None], axis=-1)
    filt = jnp.where(lg >= jnp.maximum(k_th, p_th), lg, -jnp.inf)

    def one(key, n, row):
        return jax.random.categorical(jax.random.fold_in(key, n), row)

    sampled = jax.vmap(one)(keys, n_gen, filt).astype(jnp.int32)
    return jnp.where(temps > 0, sampled, greedy)


def _prng_key_host(seed) -> np.ndarray:
    """jax.random.PRNGKey(seed) built on host: PRNGKey is a tiny device
    program, and every eager device op in the scheduler is a host
    round-trip (~3-16 ms through a remote runtime tunnel vs ~1 ms to pass
    the same bytes as a dispatch argument). Matches threefry_seed exactly:
    with x64 disabled the seed wraps to int32 and the high word is 0.
    ASSUMES the default threefry2x32 impl (uint32[2] layout); under any
    other jax_default_prng_impl it falls back to the device path so the
    key bytes stay correct (ADVICE r4)."""
    if jax.config.jax_default_prng_impl != "threefry2x32":
        return np.asarray(jax.random.key_data(jax.random.PRNGKey(seed)))
    s = int(np.asarray(seed))
    if jax.config.jax_enable_x64:
        return np.array([(s >> 32) & 0xFFFFFFFF, s & 0xFFFFFFFF], np.uint32)
    s32 = np.int64(s).astype(np.int32)
    return np.array([0, s32.astype(np.uint32)], np.uint32)


def _samp_init(max_batch: int):
    """Idle sampling state: greedy everywhere."""
    return (
        jnp.zeros(max_batch, jnp.float32),  # temperature
        jnp.zeros(max_batch, jnp.int32),  # top_k
        jnp.ones(max_batch, jnp.float32),  # top_p
        jnp.zeros((max_batch, 2), jnp.uint32),  # base PRNG key
        jnp.zeros(max_batch, jnp.int32),  # tokens generated (fold index)
    )


def _hist_init(max_batch: int, hist_width: int):
    """Per-row token history for speculative prompt lookup (width 1 dummy
    in non-speculative pools — dead carry weight, never read)."""
    return (
        jnp.zeros((max_batch, hist_width), jnp.int32),
        jnp.zeros(max_batch, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Jitted programs. Module-level (NOT methods): the jit cache is keyed on the
# function object, so per-instance bound methods would recompile every
# program for every new engine — at 1B scale that turned a warm 2s serve
# into ~16s the first time each engine object ran.
#
# The carry threaded through insert/decode is
#   (tok [B] int32, cache KVCache, row_lens [B] int32, row_pos [B] int32,
#    active [B] bool, remaining [B] int32, samp, hist)
# where samp = (temps [B] f32, top_ks [B] i32, top_ps [B] f32,
# keys [B, 2] u32, n_gen [B] i32) — per-row sampling state — and hist =
# (history [B, W] i32, hist_len [B] i32) — per-row token history for
# speculative prompt lookup (W == 1 dummy in non-speculative pools).
# Unused tails are dead weight (DCE'd) in pools that don't need them.
# The carry is donated everywhere, so the pool updates in place.
# row_lens is the cache WRITE SLOT, row_pos the RoPE position — they
# differ for doc-cache continuation rows, where the document occupies
# slots [0, dbucket) but only positions [0, doc_len). A 9th element,
# aid [B] int32, names each row's LoRA adapter in multi-adapter pools
# (0 = base; grafted into the stacked {"w","As","Bs"} leaves inside each
# program) — dead weight elsewhere.


def _with_adapters(params, cfg, aid):
    """Graft per-row adapter ids into stacked multi-LoRA leaves (no-op
    tree walk for plain param trees)."""
    from gritlm_tpu.training.lora import set_adapter_ids

    return set_adapter_ids(params, aid, cfg.num_hidden_layers)


@functools.partial(
    jax.jit, static_argnames=("cfg", "bucket", "rows", "quant")
)
def _prefill_program(params, cfg, ids, mask, samp_rows=None, aid_rows=None,
                     *, bucket, rows, quant):
    """[rows, bucket] right-padded prompts → (row-batch KVCache, first
    token per row — greedy, or per-row sampled at fold index 0 when
    `samp_rows` carries sampling state). Row caches are slot-dense
    (position == slot). Queued same-bucket requests prefill together
    (rows is padded to a power of two so a handful of executables cover
    any admission batch; all-pad dummy rows produce garbage that is
    never inserted)."""
    if aid_rows is not None:
        params = _with_adapters(params, cfg, aid_rows)
    cache = init_cache(cfg, rows, bucket, quant=quant)
    hidden, cache, _ = forward(
        params, cfg, ids, attention_mask=mask, causal=True, cache=cache
    )
    last = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)  # [rows]
    h_last = jnp.take_along_axis(hidden, last[:, None, None], axis=1)
    logits = logits_from_hidden(params, cfg, h_last)[:, 0]
    if samp_rows is not None:
        return cache, _sample_rows(logits, samp_rows)
    return cache, jnp.argmax(logits, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "chunk"), donate_argnums=(2,))
def _prefill_chunk_program(params, cfg, cache, ids, mask, samp_row=None,
                           aid_row=None, *, chunk):
    """ONE chunk of a chunked prefill (stall-free admission): append
    `chunk` prompt tokens to a single request's row cache (its write
    offset rides cache.length, so chunks just chain) and return the
    greedy/sampled next token off the chunk's LAST VALID position — the
    scheduler keeps only the final chunk's, where it is the request's
    first generated token. Bounding admission work per scheduler step to
    one chunk keeps in-flight rows' time-between-tokens flat while long
    prompts stream in (the Sarathi-Serve insight, re-built on static
    XLA shapes: every chunk is the same [1, chunk] executable)."""
    if aid_row is not None:
        params = _with_adapters(params, cfg, aid_row)
    hidden, cache, _ = forward(
        params, cfg, ids, attention_mask=mask, causal=True, cache=cache
    )
    last = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)  # [1]
    h_last = jnp.take_along_axis(hidden, last[:, None, None], axis=1)
    logits = logits_from_hidden(params, cfg, h_last)[:, 0]
    if samp_row is not None:
        return cache, _sample_rows(logits, samp_row)
    return cache, jnp.argmax(logits, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("cfg", "dbucket", "bucket", "rows")
)
def _prefill_continue_program(params, cfg, doc_k, doc_v, doc_scales,
                              doc_mask, doc_lens, ids, mask,
                              samp_rows=None, aid_rows=None, *,
                              dbucket, bucket, rows):
    """Cache-continuation prefill: documents' precomputed K/V occupy
    slots [0, dbucket) (each row valid to its own doc_len), the prompt
    prefills at slots [dbucket, dbucket+bucket) with RoPE positions
    continuing at doc_len — the serving analogue of the reference's
    doc-cache generate (rag/eval.py:237-302), batched and slot-ragged.
    Returns (row-batch KVCache [.., dbucket+bucket, ..], first tokens)."""
    quant = doc_scales is not None
    L = doc_k.shape[0]
    pk = jnp.zeros((L, rows, bucket) + doc_k.shape[3:], doc_k.dtype)
    cache = KVCache(
        k=jnp.concatenate([doc_k, pk], axis=2),
        v=jnp.concatenate([doc_v, pk], axis=2),
        mask=jnp.concatenate(
            [doc_mask, jnp.zeros((rows, bucket), doc_mask.dtype)], axis=1
        ),
        length=jnp.asarray(dbucket, jnp.int32),  # prompt writes here
        **(dict(
            k_scale=jnp.concatenate(
                [doc_scales[0],
                 jnp.zeros(doc_scales[0].shape[:3] + (bucket,),
                           doc_scales[0].dtype)], axis=3),
            v_scale=jnp.concatenate(
                [doc_scales[1],
                 jnp.zeros(doc_scales[1].shape[:3] + (bucket,),
                           doc_scales[1].dtype)], axis=3),
        ) if quant else {}),
    )
    if aid_rows is not None:
        params = _with_adapters(params, cfg, aid_rows)
    positions = doc_lens[:, None] + jnp.arange(bucket)[None, :]
    hidden, cache, _ = forward(
        params, cfg, ids, attention_mask=mask, causal=True,
        positions=positions, cache=cache,
    )
    last = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)  # [rows]
    h_last = jnp.take_along_axis(hidden, last[:, None, None], axis=1)
    logits = logits_from_hidden(params, cfg, h_last)[:, 0]
    if samp_rows is not None:
        return cache, _sample_rows(logits, samp_rows)
    return cache, jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _arm_hist(hist, slot, req_hist, first):
    """Install one request's prompt history at pool row `slot` and append
    the prefill's first sample — the lookup corpus for speculative
    proposals starts as (compact prompt, first token)."""
    history, hist_len = hist
    hist_row, hlen = req_hist
    hist_row = hist_row.at[hlen].set(first)
    history = jax.lax.dynamic_update_slice(
        history, hist_row[None, :], (slot, 0))
    return history, hist_len.at[slot].set(hlen + 1)


def _arm_samp(samp, slot, req_samp):
    """Install one request's sampling params at pool row `slot`. The
    fold index starts at 1: the prefill already spent index 0."""
    temps, tks, tps, keys, n_gen = samp
    temp, tk, tp, key = req_samp
    return (
        temps.at[slot].set(temp),
        tks.at[slot].set(tk),
        tps.at[slot].set(tp),
        jax.lax.dynamic_update_slice(keys, key[None, :], (slot, 0)),
        n_gen.at[slot].set(1),
    )


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("eos_id",))
def _insert_program(carry, rows_cache: KVCache, firsts, row_idx, slot,
                    write_len, pos0, max_new, req_samp=None, req_hist=None,
                    req_aid=None, *, eos_id):
    """Fold prefilled row `row_idx` into pool slot `slot`: copy its K/V
    and mask (zero-extended to the pool width), and arm the decode
    carry — pending token = the prefill's first sample, write slot =
    `write_len`, RoPE position = `pos0`, budget = max_new - 1 (the first
    token is already spent). The carry is donated, so the update is in
    place and chains between in-flight decode chunks."""
    (tok, cache, row_lens, row_pos, active, remaining, samp, hist,
     aid) = carry

    def put(pool, batch, axis_b=1):
        row = jax.lax.dynamic_slice_in_dim(batch, row_idx, 1, axis=axis_b)
        start = (0,) * axis_b + (slot,) + (0,) * (pool.ndim - axis_b - 1)
        return jax.lax.dynamic_update_slice(pool, row, start)

    k = put(cache.k, rows_cache.k)
    v = put(cache.v, rows_cache.v)
    row_mask = jnp.zeros((1, cache.max_len), cache.mask.dtype)
    row_mask = jax.lax.dynamic_update_slice(
        row_mask,
        jax.lax.dynamic_slice_in_dim(rows_cache.mask, row_idx, 1, axis=0),
        (0, 0),
    )
    mask = jax.lax.dynamic_update_slice(cache.mask, row_mask, (slot, 0))
    scales = {}
    if cache.quantized:
        scales = dict(
            k_scale=put(cache.k_scale, rows_cache.k_scale),
            v_scale=put(cache.v_scale, rows_cache.v_scale),
        )
    cache = cache._replace(k=k, v=v, mask=mask, **scales)

    first = jnp.take(firsts, row_idx)
    rem = max_new - 1
    tok = tok.at[slot].set(first)
    row_lens = row_lens.at[slot].set(write_len)
    row_pos = row_pos.at[slot].set(pos0)
    active = active.at[slot].set((first != eos_id) & (rem > 0))
    remaining = remaining.at[slot].set(rem)
    if req_samp is not None:
        samp = _arm_samp(samp, slot, req_samp)
    if req_hist is not None:
        hist = _arm_hist(hist, slot, req_hist, first)
    if req_aid is not None:
        aid = aid.at[slot].set(req_aid)
    return (tok, cache, row_lens, row_pos, active, remaining, samp,
            hist, aid)


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("copy_from_page", "eos_id"),
)
def _insert_paged_program(carry, rows_cache: KVCache, firsts, row_idx, slot,
                          table_row, write_len, pos0, max_new,
                          req_samp=None, req_hist=None, req_aid=None, *,
                          copy_from_page, eos_id):
    """Paged insert: scatter prefilled row `row_idx`'s pages into the pool
    pages named by `table_row` (static page indices `copy_from_page`
    onward — a prefix request's shared document pages are NOT copied),
    install the row's page table and logical mask, and arm the carry."""
    (tok, cache, row_lens, row_pos, active, remaining, samp, hist,
     aid) = carry
    page = cache.page_size
    W = rows_cache.max_len
    L = cache.k.shape[0]
    KD = cache.k.shape[3]

    k, v = cache.k, cache.v
    k_sc, v_sc = cache.k_scale, cache.v_scale
    for j in range(copy_from_page, W // page):
        pid = jnp.take(table_row, j)
        ck = jax.lax.dynamic_slice(
            rows_cache.k, (0, row_idx, j * page, 0), (L, 1, page, KD))
        cv = jax.lax.dynamic_slice(
            rows_cache.v, (0, row_idx, j * page, 0), (L, 1, page, KD))
        k = jax.lax.dynamic_update_slice(k, ck, (0, pid, 0, 0))
        v = jax.lax.dynamic_update_slice(v, cv, (0, pid, 0, 0))
        if cache.quantized:
            kv_h = cache.k_scale.shape[2]
            cks = jax.lax.dynamic_slice(
                rows_cache.k_scale, (0, row_idx, 0, j * page),
                (L, 1, kv_h, page))
            cvs = jax.lax.dynamic_slice(
                rows_cache.v_scale, (0, row_idx, 0, j * page),
                (L, 1, kv_h, page))
            k_sc = jax.lax.dynamic_update_slice(k_sc, cks, (0, pid, 0, 0))
            v_sc = jax.lax.dynamic_update_slice(v_sc, cvs, (0, pid, 0, 0))

    row_mask = jnp.zeros((1, cache.max_len), cache.mask.dtype)
    row_mask = jax.lax.dynamic_update_slice(
        row_mask,
        jax.lax.dynamic_slice_in_dim(rows_cache.mask, row_idx, 1, axis=0),
        (0, 0),
    )
    mask = jax.lax.dynamic_update_slice(cache.mask, row_mask, (slot, 0))
    table = jax.lax.dynamic_update_slice(
        cache.page_table, table_row[None, :], (slot, 0))
    scales = (dict(k_scale=k_sc, v_scale=v_sc) if cache.quantized else {})
    cache = cache._replace(k=k, v=v, mask=mask, page_table=table, **scales)

    first = jnp.take(firsts, row_idx)
    rem = max_new - 1
    tok = tok.at[slot].set(first)
    row_lens = row_lens.at[slot].set(write_len)
    row_pos = row_pos.at[slot].set(pos0)
    active = active.at[slot].set((first != eos_id) & (rem > 0))
    remaining = remaining.at[slot].set(rem)
    if req_samp is not None:
        samp = _arm_samp(samp, slot, req_samp)
    if req_hist is not None:
        hist = _arm_hist(hist, slot, req_hist, first)
    if req_aid is not None:
        aid = aid.at[slot].set(req_aid)
    return (tok, cache, row_lens, row_pos, active, remaining, samp,
            hist, aid)


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_prefix_program(carry, chunks_k, chunks_v, sk, sv, pids):
    """Pin a precomputed cache into pool pages: chunks [L, n, page, KD]
    (host-staged, page-aligned) written to physical pages `pids` [n].
    Scales [L, n, Kv, page] for int8 pools. Runs once per prefix."""
    (tok, cache, row_lens, row_pos, active, remaining, samp, hist,
     aid) = carry
    k, v = cache.k, cache.v
    k_sc, v_sc = cache.k_scale, cache.v_scale
    n = chunks_k.shape[1]
    for j in range(n):
        pid = jnp.take(pids, j)
        k = jax.lax.dynamic_update_slice(
            k, chunks_k[:, j:j + 1], (0, pid, 0, 0))
        v = jax.lax.dynamic_update_slice(
            v, chunks_v[:, j:j + 1], (0, pid, 0, 0))
        if cache.quantized:
            k_sc = jax.lax.dynamic_update_slice(
                k_sc, sk[:, j:j + 1], (0, pid, 0, 0))
            v_sc = jax.lax.dynamic_update_slice(
                v_sc, sv[:, j:j + 1], (0, pid, 0, 0))
    scales = (dict(k_scale=k_sc, v_scale=v_sc) if cache.quantized else {})
    cache = cache._replace(k=k, v=v, **scales)
    return (tok, cache, row_lens, row_pos, active, remaining, samp,
            hist, aid)


@functools.partial(jax.jit, static_argnames=("quant",))
def _gather_prefix_program(k_pages, v_pages, k_sc, v_sc, pt_rows, *, quant):
    """Gather shared prefix pages into the dense [L, rows, dbucket, ...]
    doc arrays the continuation prefill consumes (device-side — the pages
    never leave HBM except through this gather)."""
    L, _, page, KD = k_pages.shape
    rows, dp = pt_rows.shape
    flat = pt_rows.reshape(-1)
    dk = jnp.take(k_pages, flat, axis=1).reshape(L, rows, dp * page, KD)
    dv = jnp.take(v_pages, flat, axis=1).reshape(L, rows, dp * page, KD)
    if not quant:
        return dk, dv, None
    kv_h = k_sc.shape[2]
    ks = jnp.take(k_sc, flat, axis=1).reshape(L, rows, dp, kv_h, page)
    vs = jnp.take(v_sc, flat, axis=1).reshape(L, rows, dp, kv_h, page)
    ks = ks.transpose(0, 1, 3, 2, 4).reshape(L, rows, kv_h, dp * page)
    vs = vs.transpose(0, 1, 3, 2, 4).reshape(L, rows, kv_h, dp * page)
    return dk, dv, (ks, vs)


@functools.partial(jax.jit, donate_argnums=(0,))
def _deactivate_program(carry, slot):
    """Stop one pool row on device (request cancellation): the next chunk
    emits nothing for it and writes nothing past its frontier."""
    (tok, cache, row_lens, row_pos, active, remaining, samp, hist,
     aid) = carry
    return (tok, cache, row_lens, row_pos, active.at[slot].set(False),
            remaining.at[slot].set(0), samp, hist, aid)


@functools.partial(
    jax.jit,
    donate_argnums=(2,),
    static_argnames=("cfg", "steps", "eos_id", "pad_id", "sample", "shard"),
)
def _decode_chunk_program(params, cfg, carry, *, steps, eos_id, pad_id,
                          sample=False, shard=None):
    """`steps` pool-wide decode iterations on device. Each iteration
    appends every active row's pending token at its own offset and samples
    the next (greedily, or per the row's own sampling params when
    `sample=True`); a row goes inactive the moment it emits EOS or
    exhausts its token budget, so the host only intervenes at chunk
    boundaries. Returns the final carry plus stacked (tokens, emitted)
    [steps, B]."""
    params = _with_adapters(params, cfg, carry[8])  # per-row LoRA ids

    def body(c, _):
        (tok, cache, row_lens, row_pos, active, remaining, samp, hist,
         aid) = c
        hidden, cache, _ = forward(
            params, cfg, tok[:, None], causal=True,
            attention_mask=active[:, None].astype(jnp.int32),
            positions=row_pos[:, None],
            cache=cache, row_offsets=row_lens, shard_rows=shard,
        )
        logits = logits_from_hidden(params, cfg, hidden)[:, 0]
        if sample:
            nxt = _sample_rows(logits, samp)
            temps, tks, tps, keys, n_gen = samp
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        emitted = active
        nxt = jnp.where(active, nxt, pad_id)
        adv = active.astype(jnp.int32)
        if sample:
            samp = (temps, tks, tps, keys, n_gen + adv)
        row_lens = row_lens + adv
        row_pos = row_pos + adv
        remaining = remaining - adv
        active = active & (nxt != eos_id) & (remaining > 0)
        return ((nxt, cache, row_lens, row_pos, active, remaining, samp,
                 hist, aid), (nxt, emitted))

    carry, (toks, emitted) = jax.lax.scan(body, carry, None, length=steps)
    return carry, toks, emitted


@functools.partial(
    jax.jit,
    donate_argnums=(2,),
    static_argnames=("cfg", "steps", "ngram", "k", "eos_id", "pad_id",
                     "shard"),
)
def _spec_chunk_program(params, cfg, carry, *, steps, ngram, k, eos_id,
                        pad_id, shard=None):
    """`steps` SPECULATIVE pool iterations on device: each iteration
    proposes k tokens per row by prompt lookup over the row's own history,
    verifies all k+1 in one per-row-offset forward, and emits the accepted
    prefix plus the model's bonus token — greedy-parity-exact, up to k+1
    tokens per forward (spec_decode.py, adapted to per-row frontiers:
    unlike the lockstep version's shared scalar frontier, rejected slots
    are simply OVERWRITTEN by the next chunk, because each row's write
    pointer advances only by its own accepted count — no holes, no
    cache slack beyond k per request). Returns the final carry plus
    stacked (tokens [steps, B, k+1], n_emit [steps, B])."""
    from gritlm_tpu.spec_decode import _lookup_proposals

    params = _with_adapters(params, cfg, carry[8])  # per-row LoRA ids

    def body(c, _):
        (tok, cache, row_lens, row_pos, active, remaining, samp, hist,
         aid) = c
        history, hist_len = hist
        B = tok.shape[0]
        j = jnp.arange(k + 1)[None, :]

        proposals = _lookup_proposals(history, hist_len, ngram, k, pad_id)
        chunk = jnp.concatenate([tok[:, None], proposals], axis=1)
        step_mask = jnp.broadcast_to(
            active[:, None].astype(jnp.int32), (B, k + 1))
        positions = row_pos[:, None] + jnp.arange(k + 1)[None, :]
        hidden, cache, _ = forward(
            params, cfg, chunk, attention_mask=step_mask, causal=True,
            positions=positions, cache=cache, row_offsets=row_lens,
            shard_rows=shard,
        )
        greedy = jnp.argmax(
            logits_from_hidden(params, cfg, hidden), axis=-1
        ).astype(jnp.int32)  # [B, k+1]

        ok = proposals == greedy[:, :k]
        a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
        emit_tok = jnp.concatenate(
            [proposals, jnp.zeros((B, 1), jnp.int32)], axis=1)
        bonus = jnp.take_along_axis(greedy, a[:, None], axis=1)[:, 0]
        emit_tok = jnp.where(j == a[:, None], bonus[:, None], emit_tok)
        n_emit = a + 1
        is_eos = emit_tok == eos_id
        before = (jnp.cumsum(is_eos.astype(jnp.int32), axis=1)
                  - is_eos.astype(jnp.int32))
        upto_eos = jnp.sum((before == 0).astype(jnp.int32), axis=1)
        n_emit = jnp.minimum(n_emit, upto_eos)
        n_emit = jnp.minimum(n_emit, remaining)
        n_emit = jnp.where(active, n_emit, 0)
        hit_eos = jnp.any(is_eos & (j < n_emit[:, None]), axis=1)

        # cache accounting: slot 0 (pending tok) + accepted proposals stay;
        # rejected slots' bits are cleared and their K/V is overwritten by
        # the NEXT chunk (the row's pointer advances by n_slots only)
        n_slots = jnp.where(active, 1 + jnp.minimum(a, n_emit), 0)
        win = row_lens[:, None] + j
        bits = (j < n_slots[:, None]).astype(cache.mask.dtype)
        mask = cache.mask.at[jnp.arange(B)[:, None], win].set(
            bits, mode="drop")
        cache = cache._replace(mask=mask)

        valid = j < n_emit[:, None]
        hist_pos = jnp.where(
            valid, hist_len[:, None] + j, history.shape[1])
        history = history.at[jnp.arange(B)[:, None], hist_pos].set(
            emit_tok, mode="drop")
        hist_len = hist_len + n_emit
        new_tok = jnp.where(
            n_emit > 0,
            jnp.take_along_axis(
                emit_tok, jnp.maximum(n_emit - 1, 0)[:, None], axis=1
            )[:, 0],
            tok,
        )
        row_lens = row_lens + n_slots
        row_pos = row_pos + n_slots
        remaining = remaining - n_emit
        active = active & jnp.logical_not(hit_eos) & (remaining > 0)
        out_tok = jnp.where(valid, emit_tok, pad_id)
        return ((new_tok, cache, row_lens, row_pos, active, remaining,
                 samp, (history, hist_len), aid), (out_tok, n_emit))

    carry, (toks, n_emit) = jax.lax.scan(body, carry, None, length=steps)
    return carry, toks, n_emit


class ServingEngine:
    """Continuous-batching decode over a fixed slot pool.

    >>> eng = ServingEngine(cfg, params, max_batch=8, max_len=4096)
    >>> done = eng.run([Request(ids, max_new_tokens=64), ...])

    Greedy decoding by default (the parity-testable mode). `sampling=True`
    compiles the sampling decode chunk instead: each request then decodes
    with its OWN (temperature, top_k, top_p, seed) — schedule-invariant
    per-request key chains, see Request. Greedy requests in a sampling
    pool stay exactly greedy. Completions include the EOS token when one
    was emitted, matching generate()'s num_valid accounting."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: dict,
        *,
        max_batch: int = 8,
        max_len: int = 4096,
        kv_quant: bool = False,
        eos_id: int = 2,
        pad_id: int = 0,
        chunk_size: int = 16,
        adaptive_chunk: bool = False,
        prompt_buckets: Sequence[int] = (64, 128, 256, 512, 1024, 2048),
        overlap: bool = True,
        mesh=None,
        paged: bool = False,
        page_size: int = 256,
        pool_pages: Optional[int] = None,
        sampling: bool = False,
        speculative: bool = False,
        spec_ngram: int = 3,
        spec_k: int = 7,
        prefill_chunk: Optional[int] = None,
        adapters=None,  # {name: lora_tree} — per-request LoRA serving
        lora_scale: float = 4.0,  # alpha/r of the adapter trees
        on_token=None,  # streaming callback: on_token(request_id, token)
        # unified serving (EmbedRequest): embedding-forward config,
        # mirroring GritLM(mode="unified") defaults — bidirectional
        # attention, mean pooling, L2-normalized (gritlm.py encode path)
        pooling_method: str = "mean",
        embed_causal: bool = False,
        normalized: bool = True,
        embed_batch: Optional[int] = None,  # rows per embed dispatch
        on_embedding=None,  # streaming callback: on_embedding(id, vec)
    ):
        self.cfg = cfg
        self.B = max_batch
        self.max_len = max_len
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.chunk_size = chunk_size
        self.adaptive_chunk = adaptive_chunk
        self.speculative = speculative
        self.spec_ngram = spec_ngram
        self.spec_k = spec_k
        self.prefill_chunk = prefill_chunk
        self.on_token = on_token
        self.pooling_method = pooling_method
        self.embed_causal = embed_causal
        self.normalized = normalized
        self.embed_batch = embed_batch or max_batch
        self.on_embedding = on_embedding
        self._adapter_idx: Dict[str, int] = {}
        if adapters:
            # stack every adapter onto the base as {"w","As","Bs"} leaves
            # (slot 0 = zero adapter, so base-model requests cost no
            # branch); per-row ids ride the carry and are grafted into
            # the leaves inside each program (lora.set_adapter_ids)
            from gritlm_tpu.training.lora import stack_adapters

            names = list(adapters)
            self._adapter_idx = {n: i + 1 for i, n in enumerate(names)}
            params = stack_adapters(
                params, [adapters[n] for n in names], lora_scale
            )
        if speculative and sampling:
            raise ValueError(
                "speculative serving is greedy-only (it must be "
                "parity-exact with the greedy decode)"
            )
        self.buckets = [b for b in prompt_buckets if b <= max_len]
        if prefill_chunk is not None:
            bad = [b for b in self.buckets if b % prefill_chunk]
            if bad:
                raise ValueError(
                    f"prefill_chunk {prefill_chunk} must divide every "
                    f"prompt bucket (got {bad}): a prompt's chunk count "
                    "must fit its row cache exactly"
                )
        self.overlap = overlap
        self.paged = paged
        self.page = page_size
        if paged:
            if max_len % page_size:
                raise ValueError(f"max_len {max_len} % page {page_size} != 0")
            # buckets must be page-aligned so a request's private tail
            # starts on a page boundary (zero-copy prefix sharing relies
            # on shared pages never being written)
            self.buckets = [b for b in self.buckets if b % page_size == 0]
            if not self.buckets:
                raise ValueError(
                    f"no prompt bucket is a multiple of page {page_size}"
                )
            self.pool_pages = pool_pages or (
                (max_batch * max_len) // page_size + 1
            )
            # page 0 is the scratch page for inactive rows' lockstep
            # writes (transformer paged append) — never allocated
            self._free_pages = list(range(1, self.pool_pages))
            self._slot_pages: Dict[int, List[int]] = {}
            self.prefixes: Dict[object, tuple] = {}  # key → (pids, w)

        # Multi-chip serving: params sharded per the GSPMD rules (TP/FSDP),
        # the slot pool and all [B] carry vectors sharded over the batch
        # axes — the SAME compiled programs run and XLA inserts the
        # collectives (mirrors GritLM's mesh-sharded generate path,
        # gritlm.py:436-484). mesh=None → single default device.
        self.mesh = mesh
        self._shard_rows = None  # (mesh, axes) — paged pools on a mesh
        self._put_rows = jnp.asarray  # prefill inputs [rows, bucket]
        _put_vec = jnp.asarray  # carry vectors [B]
        _put_cache = lambda c: c
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gritlm_tpu.parallel.mesh import BATCH_AXES
            from gritlm_tpu.parallel.sharding import shard_params

            axes = tuple(a for a in BATCH_AXES if a in mesh.shape)
            self._batch_shards = int(
                np.prod([mesh.shape[a] for a in axes], dtype=np.int64)
            )
            if max_batch % self._batch_shards:
                raise ValueError(
                    f"max_batch {max_batch} not divisible by the mesh's "
                    f"batch shards {self._batch_shards}"
                )
            batch = NamedSharding(mesh, P(axes))
            row1 = NamedSharding(mesh, P(None, axes))
            params = shard_params(mesh, params)
            _put_vec = lambda x: jax.device_put(jnp.asarray(x), batch)
            if paged:
                # paged pools on a mesh: rows (page table, slot mask)
                # shard over the batch axes; the page POOL replicates, so
                # pinned prefix pages are shared zero-copy across shards
                # and the host allocator stays shard-oblivious. The paged
                # kernel runs per-shard via shard_map inside forward
                # (transformer.py shard_rows).
                rep = NamedSharding(mesh, P())
                self._shard_rows = (mesh, axes)
                _put_cache = lambda c: c._replace(
                    k=jax.device_put(c.k, rep),
                    v=jax.device_put(c.v, rep),
                    mask=jax.device_put(c.mask, batch),
                    page_table=jax.device_put(c.page_table, batch),
                    **(dict(k_scale=jax.device_put(c.k_scale, rep),
                            v_scale=jax.device_put(c.v_scale, rep))
                       if c.quantized else {}),
                )
            else:
                _put_cache = lambda c: c._replace(
                    k=jax.device_put(c.k, row1),
                    v=jax.device_put(c.v, row1),
                    mask=jax.device_put(c.mask, batch),
                    **(dict(k_scale=jax.device_put(c.k_scale, row1),
                            v_scale=jax.device_put(c.v_scale, row1))
                       if c.quantized else {}),
                )
            self._put_rows = lambda x: (
                jax.device_put(jnp.asarray(x), batch)
                if x.shape[0] % self._batch_shards == 0 else jnp.asarray(x)
            )
        self.params = params

        self.kv_quant = kv_quant
        pool = _put_cache(
            init_paged_cache(cfg, max_batch, max_len, self.pool_pages,
                             page=page_size, quant=kv_quant)
            if paged else
            init_cache(cfg, max_batch, max_len, quant=kv_quant)
        )
        self.sampling = sampling
        self.carry = (
            _put_vec(np.full(max_batch, pad_id, np.int32)),
            pool,
            _put_vec(np.zeros(max_batch, np.int32)),
            _put_vec(np.zeros(max_batch, np.int32)),
            _put_vec(np.zeros(max_batch, bool)),
            _put_vec(np.zeros(max_batch, np.int32)),
            tuple(_put_vec(np.asarray(x)) for x in _samp_init(max_batch)),
            tuple(
                _put_vec(np.asarray(x))
                for x in _hist_init(max_batch,
                                    max_len if speculative else 1)
            ),
            _put_vec(np.zeros(max_batch, np.int32)),  # adapter ids
        )
        self.slots: Dict[int, _Slot] = {}
        self.queue: List[Request] = []
        self.finished: List[Completion] = []
        self._pending: List[_Pending] = []  # chunked prefills in flight
        self._draining: Dict[int, int] = {}  # cancelled slots cooling down
        self._prev = None  # in-flight chunk's (toks, emitted) device arrays
        self.embed_queue: List[EmbedRequest] = []
        self.finished_embeds: List[EmbedCompletion] = []
        self._prev_embed = None  # in-flight (emb device array, requests)
        self._steps = 0  # device decode steps taken (for stats)

    # ---- scheduler ----------------------------------------------------

    def register_prefix(self, key, entry: tuple) -> None:
        """Pin a precomputed cache (doc-store entry format: k/v
        [L, w, Kv*Dh], w, scales) into shared pool pages. Requests with
        `prefix=key` reference these pages read-only — the cache is
        uploaded and stored ONCE no matter how many requests continue it.
        Pages stay pinned for the engine's lifetime (paged pools only)."""
        if not self.paged:
            raise ValueError("register_prefix requires paged=True")
        k, v, w, ks, vs = entry
        if (ks is not None) != self.kv_quant:
            raise ValueError(
                f"prefix quantization does not match kv_quant={self.kv_quant}"
            )
        if key in self.prefixes:
            return
        page = self.page
        npg = -(-w // page)
        if npg > len(self._free_pages):
            raise ValueError(
                f"prefix needs {npg} pages, only {len(self._free_pages)} free"
            )
        pids = [self._free_pages.pop() for _ in range(npg)]
        L, _, KD = k.shape
        ck = np.zeros((L, npg * page, KD), k.dtype)
        cv = np.zeros_like(ck)
        ck[:, :w], cv[:, :w] = k, v
        ck = ck.reshape(L, npg, page, KD)
        cv = cv.reshape(L, npg, page, KD)
        sk = sv = None
        if self.kv_quant:
            kv_h = ks.shape[1]
            sk = np.zeros((L, kv_h, npg * page), ks.dtype)
            sv = np.zeros_like(sk)
            sk[..., :w], sv[..., :w] = ks, vs
            sk = sk.reshape(L, kv_h, npg, page).transpose(0, 2, 1, 3)
            sv = sv.reshape(L, kv_h, npg, page).transpose(0, 2, 1, 3)
        self.carry = _write_prefix_program(
            self.carry, jnp.asarray(ck), jnp.asarray(cv),
            jnp.asarray(sk) if sk is not None else None,
            jnp.asarray(sv) if sv is not None else None,
            jnp.asarray(np.asarray(pids, np.int32)),
        )
        self.prefixes[key] = (pids, w)

    def release_prefix(self, key) -> bool:
        """Unpin a registered prefix and return its pages to the free
        list (the hot-doc eviction path — a doc store rotates documents
        through the pool as traffic shifts). Refuses while any queued,
        pending, or in-flight request still references the prefix: those
        rows' page tables point at the shared pages, and freeing them
        would let a later admission overwrite live KV. Returns True if
        released, False if unknown."""
        if key not in self.prefixes:
            return False
        refs = [r.request_id for r in self.queue if r.prefix == key]
        refs += [s.request.request_id for s in self.slots.values()
                 if s.request.prefix == key]
        refs += [p.request.request_id for p in self._pending
                 if p.request.prefix == key]
        if refs:
            raise ValueError(
                f"prefix {key!r} still referenced by {len(refs)} "
                f"request(s): {refs[:4]}"
            )
        pids, _ = self.prefixes.pop(key)
        self._free_pages.extend(pids)
        return True

    def _pages_needed(self, req: Request) -> int:
        span = _bucket(len(req.input_ids), self.buckets) + req.max_new_tokens
        if req.doc_cache is not None:
            span += _bucket(req.doc_cache[2], self.buckets)
        if self.speculative:
            # the verify frontier writes up to spec_k slots past the last
            # accepted token; those logical slots need real pages (an
            # unmapped chunk aliases the scratch page and would corrupt
            # accepted tokens' K/V)
            span += self.spec_k
        return -(-span // self.page)

    def _req_samp_scalars(self, r: Request):
        """Per-request sampling state for the insert programs (None in
        greedy pools — keeps the greedy-compiled programs unchanged)."""
        if not self.sampling:
            return None
        # host scalars/arrays only: they ride the insert dispatch instead
        # of costing an eager device_put round-trip each
        return (
            np.float32(r.temperature),
            np.int32(r.top_k),
            np.float32(r.top_p),
            _prng_key_host(r.seed),
        )

    def _samp_rows_for(self, rs, rows):
        """[rows]-wide sampling vectors for an admission batch's prefill
        (fold index 0 for every row); pad rows are greedy."""
        if not self.sampling:
            return None
        temps = np.zeros(rows, np.float32)
        tks = np.zeros(rows, np.int32)
        tps = np.ones(rows, np.float32)
        keys = np.zeros((rows, 2), np.uint32)
        for j, r in enumerate(rs):
            temps[j], tks[j], tps[j] = r.temperature, r.top_k, r.top_p
            keys[j] = _prng_key_host(r.seed)
        return (temps, tks, tps, keys, np.zeros(rows, np.int32))

    def _req_aid(self, r: Request):
        """This request's adapter slot (None in adapter-less pools so the
        compiled programs stay unchanged; 0 = base model)."""
        if not self._adapter_idx:
            return None
        return np.int32(self._adapter_idx.get(r.adapter, 0))

    def _aid_rows_for(self, rs, rows):
        if not self._adapter_idx:
            return None
        out = np.zeros(rows, np.int32)
        for j, r in enumerate(rs):
            out[j] = self._adapter_idx.get(r.adapter, 0)
        return out

    def _req_hist_row(self, r: Request):
        """One request's compact prompt as a pool-width history row (the
        prompt-lookup corpus; generated tokens append on device). None in
        non-speculative pools so their compiled programs are unchanged."""
        if not self.speculative:
            return None
        seq = list(r.hist_ids or []) + list(r.input_ids)
        # generated tokens append at hist_len; keep the corpus TAIL when
        # hist_ids would overflow the row (recent context matters most)
        cap = self.max_len - r.max_new_tokens
        seq = seq[-cap:]
        row = np.zeros(self.max_len, np.int32)
        row[: len(seq)] = seq
        return row, np.int32(len(seq))

    def submit(self, req: Request) -> None:
        if req.temperature > 0.0 and not self.sampling:
            raise ValueError(
                "temperature > 0 requires ServingEngine(sampling=True)"
            )
        if req.adapter is not None and req.adapter not in self._adapter_idx:
            raise ValueError(
                f"unknown adapter {req.adapter!r} (build the engine with "
                "adapters={name: lora_tree, ...})"
            )
        if req.prefix is not None:
            if not self.paged or req.prefix not in self.prefixes:
                raise ValueError(
                    f"unknown prefix {req.prefix!r} (register_prefix first)"
                )
            if req.doc_cache is not None:
                raise ValueError("pass doc_cache OR prefix, not both")
        need = len(req.input_ids) + req.max_new_tokens
        if req.doc_cache is not None:
            if (req.doc_cache[3] is not None) != self.kv_quant:
                raise ValueError(
                    "doc_cache quantization does not match the pool's "
                    f"kv_quant={self.kv_quant}"
                )
            need += _bucket(req.doc_cache[2], self.buckets)
        if req.prefix is not None:
            need += len(self.prefixes[req.prefix][0]) * self.page
        if self.speculative:
            # frontier slack: a verify chunk writes k+1 slots at the row's
            # write pointer before acceptance masks them, so the last
            # chunk can touch slots up to (written + spec_k)
            need += self.spec_k
        if need > self.max_len:
            raise ValueError(
                f"prompt {len(req.input_ids)} + max_new {req.max_new_tokens}"
                + (" + doc bucket" if req.doc_cache is not None
                   or req.prefix is not None else "")
                + f" exceeds pool max_len {self.max_len}"
            )
        self.queue.append(req)

    # ---- unified serving: embedding requests in the same pool ----------

    def submit_embed(self, req: EmbedRequest) -> None:
        if len(req.input_ids) > self.buckets[-1]:
            raise ValueError(
                f"embed prompt {len(req.input_ids)} exceeds largest "
                f"prompt bucket {self.buckets[-1]}"
            )
        if req.adapter is not None and req.adapter not in self._adapter_idx:
            raise ValueError(
                f"unknown adapter {req.adapter!r} (build the engine with "
                "adapters={name: lora_tree, ...})"
            )
        self.embed_queue.append(req)

    def _dispatch_embeds(self):
        """One same-bucket embedding batch per scheduler step (bounded
        work per step, like chunked prefill: co-tenant generations wait
        at most one decode chunk + one embed forward). Returns the
        in-flight (device embeddings, requests) pair — results stream
        back while the next decode chunk computes."""
        if not self.embed_queue:
            return None
        if any(r.priority for r in self.embed_queue):
            self.embed_queue.sort(key=lambda r: -r.priority)  # stable
        bucket = _bucket(len(self.embed_queue[0].input_ids), self.buckets)
        group, rest = [], []
        for r in self.embed_queue:
            if (len(group) < self.embed_batch
                    and _bucket(len(r.input_ids), self.buckets) == bucket):
                group.append(r)
            else:
                rest.append(r)
        self.embed_queue = rest
        n = len(group)
        ids = np.full((n, bucket), self.pad_id, np.int32)
        mask = np.zeros((n, bucket), np.int32)
        pmask = np.zeros((n, bucket), np.int32)
        for i, r in enumerate(group):
            ln = len(r.input_ids)
            ids[i, :ln] = r.input_ids
            mask[i, :ln] = 1
            # instruction tokens pollute mean pooling only (reference
            # masks them for mean/weightedmean, gritlm/gritlm.py:144-153)
            start = r.instr_len if "mean" in self.pooling_method else 0
            pmask[i, start:ln] = 1
        if self.mesh is not None:
            # pad rows to the mesh's batch-shard count (one valid token
            # keeps pad rows' pooling masks non-empty — gritlm.encode)
            padr = -n % self._batch_shards
            if padr:
                ids = np.pad(ids, ((0, padr), (0, 0)),
                             constant_values=self.pad_id)
                mask = np.pad(mask, ((0, padr), (0, 0)))
                mask[n:, 0] = 1
                pmask = np.pad(pmask, ((0, padr), (0, 0)))
                pmask[n:, 0] = 1
        from gritlm_tpu.gritlm import _encode_step  # same jitted program
        # as GritLM.encode — pool embeddings are bitwise the encoder's

        params = self.params
        if self._adapter_idx:
            # per-row adapter ids through the stacked leaves (0 = base);
            # the [B, S, D] multi-adapter _mm path covers encode too
            aid = np.zeros(ids.shape[0], np.int32)
            for i, r in enumerate(group):
                if r.adapter is not None:
                    aid[i] = self._adapter_idx[r.adapter]
            params = _with_adapters(params, self.cfg, aid)
        emb = _encode_step(
            params, None, self.cfg,
            self._put_rows(ids), self._put_rows(mask),
            self._put_rows(pmask),
            pooling_method=self.pooling_method, causal=self.embed_causal,
            normalized=self.normalized, has_projection=False,
        )
        emb.copy_to_host_async()
        return (emb, group)

    def _process_embeds(self, prev) -> None:
        if prev is None:
            return
        emb, group = prev
        out = np.asarray(jax.device_get(emb), np.float32)
        for i, r in enumerate(group):
            self.finished_embeds.append(
                EmbedCompletion(r.request_id, out[i])
            )
            if self.on_embedding is not None:
                self.on_embedding(r.request_id, out[i])

    def take_embeddings(self) -> List[EmbedCompletion]:
        """Drain finished embeddings (finish order)."""
        out, self.finished_embeds = self.finished_embeds, []
        return out

    def _doc_len(self, r: Request) -> int:
        if r.prefix is not None:
            return self.prefixes[r.prefix][1]
        if r.doc_cache is not None:
            return r.doc_cache[2]
        return 0

    def _admit(self) -> None:
        if any(r.priority for r in self.queue):
            self.queue.sort(key=lambda r: -r.priority)  # stable: FIFO ties
        reserved = {p.slot for p in self._pending}
        free = [i for i in range(self.B)
                if i not in self.slots and i not in reserved
                and i not in self._draining]
        taken: List[tuple] = []  # (request, private page ids | None)
        while self.queue and len(taken) < len(free):
            r = self.queue[0]
            pids = None
            if self.paged:
                n = self._pages_needed(r)
                if n > len(self._free_pages):
                    break  # FIFO: the head waits for pages to free
                pids = [self._free_pages.pop() for _ in range(n)]
            taken.append((self.queue.pop(0), pids))
        if not taken:
            return
        if self.prefill_chunk is not None:
            # stall-free admission: fresh prompts stream in chunks between
            # decode chunks instead of one monolithic prefill. Doc-cache /
            # prefix continuations keep the grouped path (their dominant
            # cost, the document, is already precomputed).
            rest = []
            for r, pids in taken:
                if r.doc_cache is None and r.prefix is None:
                    slot = free.pop(0)
                    b = _bucket(len(r.input_ids), self.buckets)
                    self._pending.append(_Pending(
                        request=r, slot=slot,
                        cache=init_cache(self.cfg, 1, b,
                                         quant=self.kv_quant),
                        bucket=b, pids=pids,
                    ))
                else:
                    rest.append((r, pids))
            taken = rest
            if not taken:
                return
        groups: Dict[tuple, List[tuple]] = {}
        for r, pids in taken:
            b = _bucket(len(r.input_ids), self.buckets)
            if r.prefix is not None:
                db = len(self.prefixes[r.prefix][0]) * self.page
                kind = "prefix"
            elif r.doc_cache is not None:
                db, kind = _bucket(r.doc_cache[2], self.buckets), "host"
            else:
                db, kind = 0, "fresh"
            groups.setdefault((db, b, kind), []).append((r, pids))
        for (dbucket, bucket, kind), rps in groups.items():
            # same-bucket requests prefill as one batch (rows padded to
            # a power of two to bound the executable count)
            rs = [r for r, _ in rps]
            rows = 1 << max(0, len(rs) - 1).bit_length()
            ids = np.full((rows, bucket), self.pad_id, np.int32)
            mask = np.zeros((rows, bucket), np.int32)
            for j, r in enumerate(rs):
                n = len(r.input_ids)
                ids[j, :n] = r.input_ids
                mask[j, :n] = 1
            samp_rows = self._samp_rows_for(rs, rows)
            aid_rows = self._aid_rows_for(rs, rows)
            if kind == "fresh":
                rowc, firsts = _prefill_program(
                    self.params, self.cfg, self._put_rows(ids),
                    self._put_rows(mask), samp_rows, aid_rows,
                    bucket=bucket, rows=rows, quant=self.kv_quant,
                )
            elif kind == "host":
                rowc, firsts = self._prefill_continue(
                    rs, ids, mask, dbucket, bucket, rows, samp_rows,
                    aid_rows,
                )
            else:
                rowc, firsts = self._prefill_continue_prefix(
                    rs, ids, mask, dbucket, bucket, rows, samp_rows,
                    aid_rows,
                )
            firsts.copy_to_host_async()
            for j, (r, pids) in enumerate(rps):
                slot = free.pop(0)
                write_len = dbucket + len(r.input_ids)
                pos0 = self._doc_len(r) + len(r.input_ids)
                if self.paged:
                    maxp = self.max_len // self.page
                    table = np.zeros(maxp, np.int32)
                    off = 0
                    if kind == "prefix":
                        ppids = self.prefixes[r.prefix][0]
                        table[: len(ppids)] = ppids
                        off = len(ppids)
                    table[off: off + len(pids)] = pids
                    self._slot_pages[slot] = pids
                    # host-typed args throughout: each eager jnp scalar
                    # here was a device_put round-trip, ~16 ms of the
                    # ~20 ms/request admission overhead measured on v5e
                    self.carry = _insert_paged_program(
                        self.carry, rowc, firsts, np.int32(j),
                        np.int32(slot), table,
                        np.int32(write_len), np.int32(pos0),
                        np.int32(r.max_new_tokens),
                        self._req_samp_scalars(r), self._req_hist_row(r),
                        self._req_aid(r),
                        copy_from_page=(dbucket // self.page
                                        if kind == "prefix" else 0),
                        eos_id=self.eos_id,
                    )
                else:
                    self.carry = _insert_program(
                        self.carry, rowc, firsts, np.int32(j),
                        np.int32(slot), np.int32(write_len),
                        np.int32(pos0), np.int32(r.max_new_tokens),
                        self._req_samp_scalars(r), self._req_hist_row(r),
                        self._req_aid(r),
                        eos_id=self.eos_id,
                    )
                self.slots[slot] = _Slot(request=r, first_src=(firsts, j))

    def _advance_pending(self) -> None:
        """Advance EVERY chunked prefill by one chunk (each pending
        request's prompt progresses in parallel; the admission work a
        scheduler step inserts between decode chunks is bounded by
        n_pending <= free slots chunk-forwards) and fold completed ones
        into their reserved slots."""
        C = self.prefill_chunk
        for p in list(self._pending):
            seg = p.request.input_ids[p.filled : p.filled + C]
            ids = np.full((1, C), self.pad_id, np.int32)
            mask = np.zeros((1, C), np.int32)
            ids[0, : len(seg)] = seg
            mask[0, : len(seg)] = 1
            samp = (self._samp_rows_for([p.request], 1)
                    if self.sampling else None)
            p.cache, p.first = _prefill_chunk_program(
                self.params, self.cfg, p.cache, ids, mask, samp,
                self._aid_rows_for([p.request], 1), chunk=C,
            )
            p.filled += len(seg)
            if p.filled >= len(p.request.input_ids):
                self._pending.remove(p)
                self._insert_pending(p)

    def _insert_pending(self, p: _Pending) -> None:
        r = p.request
        write_len = len(r.input_ids)
        if self.paged:
            maxp = self.max_len // self.page
            table = np.zeros(maxp, np.int32)
            table[: len(p.pids)] = p.pids
            self._slot_pages[p.slot] = p.pids
            self.carry = _insert_paged_program(
                self.carry, p.cache, p.first, np.int32(0),
                np.int32(p.slot), table,
                np.int32(write_len), np.int32(write_len),
                np.int32(r.max_new_tokens), self._req_samp_scalars(r),
                self._req_hist_row(r), self._req_aid(r), copy_from_page=0,
                eos_id=self.eos_id,
            )
        else:
            self.carry = _insert_program(
                self.carry, p.cache, p.first, np.int32(0),
                np.int32(p.slot), np.int32(write_len),
                np.int32(write_len), np.int32(r.max_new_tokens),
                self._req_samp_scalars(r), self._req_hist_row(r),
                self._req_aid(r),
                eos_id=self.eos_id,
            )
        self.slots[p.slot] = _Slot(request=r, first_src=(p.first, 0))

    def _prefill_continue_prefix(self, rs, ids, mask, dbucket, bucket, rows,
                                 samp_rows=None, aid_rows=None):
        """Gather the group's shared prefix pages (device-side, zero host
        traffic) into the dense doc arrays the continuation prefill eats."""
        npg = dbucket // self.page
        pt = np.zeros((rows, npg), np.int32)
        dl = np.zeros((rows,), np.int32)
        for j, r in enumerate(rs):
            pids, w = self.prefixes[r.prefix]
            pt[j] = pids
            dl[j] = w
        cache = self.carry[1]
        dk, dv, sc = _gather_prefix_program(
            cache.k, cache.v, cache.k_scale, cache.v_scale,
            pt, quant=self.kv_quant,
        )
        doc_mask = (np.arange(dbucket)[None, :] < dl[:, None]).astype(np.int32)
        return _prefill_continue_program(
            self.params, self.cfg, dk, dv, sc,
            doc_mask, dl,
            self._put_rows(ids), self._put_rows(mask), samp_rows,
            aid_rows, dbucket=dbucket, bucket=bucket, rows=rows,
        )

    def _prefill_continue(self, rs, ids, mask, dbucket, bucket, rows,
                          samp_rows=None, aid_rows=None):
        """Stack the group's host doc caches into [L, rows, dbucket, ...]
        arrays and run the cache-continuation prefill."""
        L = rs[0].doc_cache[0].shape[0]
        lanes = rs[0].doc_cache[0].shape[-1]
        doc_k = np.zeros((L, rows, dbucket, lanes), rs[0].doc_cache[0].dtype)
        doc_v = np.zeros_like(doc_k)
        doc_mask = np.zeros((rows, dbucket), np.int32)
        doc_lens = np.zeros((rows,), np.int32)
        scales = None
        if self.kv_quant:
            kv = rs[0].doc_cache[3].shape[1]
            ks = np.zeros((L, rows, kv, dbucket), rs[0].doc_cache[3].dtype)
            vs = np.zeros_like(ks)
        for j, r in enumerate(rs):
            k, v, w, ksj, vsj = r.doc_cache
            doc_k[:, j, :w] = k
            doc_v[:, j, :w] = v
            doc_mask[j, :w] = 1
            doc_lens[j] = w
            if self.kv_quant:
                ks[:, j, :, :w] = ksj
                vs[:, j, :, :w] = vsj
        if self.kv_quant:
            scales = (ks, vs)
        return _prefill_continue_program(
            self.params, self.cfg, doc_k, doc_v,
            scales, doc_mask, doc_lens,
            self._put_rows(ids), self._put_rows(mask), samp_rows,
            aid_rows, dbucket=dbucket, bucket=bucket, rows=rows,
        )

    def _emit(self, slot: int, tok: int) -> None:
        """Account one generated token: append to the slot's stream, fire
        the streaming callback, and retire the slot on EOS/budget."""
        s = self.slots[slot]
        s.generated.append(tok)
        if self.on_token is not None:
            self.on_token(s.request.request_id, tok)
        self._maybe_finish(slot, tok)

    def _maybe_finish(self, slot: int, tok: int) -> None:
        s = self.slots[slot]
        done_eos = tok == self.eos_id
        done_len = len(s.generated) >= s.request.max_new_tokens
        if done_eos or done_len:
            self.finished.append(
                Completion(
                    request_id=s.request.request_id,
                    token_ids=list(s.generated),
                    finish_reason="eos" if done_eos else "length",
                    prompt_len=len(s.request.input_ids),
                )
            )
            del self.slots[slot]
            # slot's cache rows stay as dead data; mask is rebuilt on the
            # next insert, so no cleanup pass is needed
            if self.paged:
                # private pages return to the pool (prefix pages stay
                # pinned). An in-flight chunk may still READ them, but any
                # re-WRITE (a later insert) chains after it on the carry,
                # so stale reads only feed inactive rows' discarded output.
                self._free_pages.extend(self._slot_pages.pop(slot, []))

    def cancel(self, request_id) -> bool:
        """Cancel a request wherever it is: queued (dropped), mid chunked
        prefill (slot + pages released), or decoding (its device row is
        deactivated; the slot cools down for two scheduler steps so an
        in-flight chunk's stale emissions can never leak into a new
        tenant). Emits a Completion with finish_reason='cancelled' and
        whatever tokens were already generated. Returns False if the id
        is unknown (e.g. already finished — its Completion stands)."""
        for i, r in enumerate(self.queue):
            if r.request_id == request_id:
                self.queue.pop(i)
                self.finished.append(Completion(
                    request_id=request_id, token_ids=[],
                    finish_reason="cancelled",
                    prompt_len=len(r.input_ids)))
                return True
        for i, p in enumerate(self._pending):
            if p.request.request_id == request_id:
                self._pending.pop(i)
                if p.pids:
                    self._free_pages.extend(p.pids)
                self.finished.append(Completion(
                    request_id=request_id, token_ids=[],
                    finish_reason="cancelled",
                    prompt_len=len(p.request.input_ids)))
                return True
        for slot, sl in self.slots.items():
            if sl.request.request_id == request_id:
                self.carry = _deactivate_program(self.carry,
                                                 np.int32(slot))
                self.finished.append(Completion(
                    request_id=request_id, token_ids=list(sl.generated),
                    finish_reason="cancelled",
                    prompt_len=len(sl.request.input_ids)))
                del self.slots[slot]
                if self.paged:
                    self._free_pages.extend(self._slot_pages.pop(slot, []))
                self._draining[slot] = 2
                return True
        return False

    def _resolve_firsts(self) -> None:
        """Fetch any pending prefill first-tokens (lazily, so admission
        itself never blocked on them) and account them as emissions."""
        fetched: Dict[int, np.ndarray] = {}
        for slot in list(self.slots):
            s = self.slots[slot]
            if s.first_src is None:
                continue
            arr, j = s.first_src
            key = id(arr)
            if key not in fetched:
                fetched[key] = np.asarray(arr)
            s.first_src = None
            self._emit(slot, int(fetched[key][j]))

    def _process(self, chunk) -> None:
        """Read one chunk's results off device and retire finished rows.
        First tokens resolve first — a slot's prefill sample precedes its
        chunk emissions in the stream."""
        self._resolve_firsts()
        if chunk is None:
            return
        toks_d, emitted_d = chunk
        toks = np.asarray(toks_d)  # [steps, B] (spec: [steps, B, k+1])
        emitted = np.asarray(emitted_d)  # [steps, B] bool (spec: n_emit i32)
        if self.speculative:
            for i in list(self.slots.keys()):
                s = self.slots[i]
                for step in range(toks.shape[0]):
                    for t in toks[step, i, : emitted[step, i]].tolist():
                        self._emit(i, int(t))
                        if i not in self.slots:
                            break
                    if i not in self.slots:
                        break
            return
        for i in list(self.slots.keys()):
            # each emission wrote one pending token's K/V and advanced the
            # device row pointer once; rows the device already stopped
            # (EOS/budget) have emitted=False, so stale chunk data for a
            # reused slot index is self-masking
            for t in toks[emitted[:, i], i].tolist():
                self._emit(i, int(t))
                if i not in self.slots:
                    break  # device stopped this row too (EOS/budget)

    def _chunk_steps(self) -> int:
        """Decode steps for the next dispatched chunk. Fixed at
        chunk_size unless adaptive: the host knows each row's remaining
        token budget exactly (budget termination is deterministic; EOS
        only ends rows earlier), so while work is queued the chunk
        shrinks toward the earliest possible completion — a freed slot
        re-admits within a few steps instead of idling up to
        2*chunk_size steps while a queued request waits. Power-of-two
        rounding bounds the compiled chunk programs at log2(chunk)+1.
        Returns 0 when every row is already fully dispatched (a chunk
        would emit nothing; pending results will retire the rows).

        Default OFF (see the module design notes): measured on v5e
        through the remote tunnel, the extra dispatches cost more than
        the reclaimed idle slot-steps — 986 vs 1133 tok/s dense, 950 vs
        1164 paged on the ragged24 workload. Worth enabling on a
        locally-attached host where dispatch is ~100 us."""
        if self.speculative:
            # spec steps emit up to k+1 tokens each; the steps<->tokens
            # budget mapping is loose, so spec pools keep fixed chunks
            return self.chunk_size
        rem = [s.request.max_new_tokens - 1 - s.dispatched
               for s in self.slots.values()]
        live = [r for r in rem if r > 0]
        if not live:
            return 0
        if not self.adaptive_chunk:
            return self.chunk_size
        if self.queue or self._pending:
            m = min(live)  # round DOWN: never overshoot a completion
            if m >= self.chunk_size:
                return self.chunk_size
            return 1 << (m.bit_length() - 1)
        # nothing waits for a slot: one chunk covering the longest row
        # drains the pool with the fewest dispatches (round UP, capped)
        m = max(live)
        if m >= self.chunk_size:
            return self.chunk_size
        return 1 << (m - 1).bit_length() if m > 1 else 1

    def step(self) -> int:
        """One scheduler iteration: admit what fits, dispatch one device
        chunk (`chunk_size` decode iterations) for the pool, and process
        results. With overlap=True the chunk processed is the PREVIOUS
        one (its bytes already streamed back while this chunk computes);
        with overlap=False results are consumed before admitting, so a
        freed slot is refilled the same step it frees. Returns the number
        of host-known-occupied slots (0 = pool empty; a nonzero return
        with no chunk dispatched means rows are fully dispatched and
        awaiting retirement — keep stepping until 0, ADVICE r4)."""
        if not self.overlap:
            self._process(self._prev)
            self._prev = None
            self._process_embeds(self._prev_embed)
            self._prev_embed = None
        self._admit()
        if self.prefill_chunk is not None:
            self._advance_pending()
        cur_embed = self._dispatch_embeds()
        n_active = len(self.slots)
        cur = None
        steps = self._chunk_steps() if self.slots else 0
        if steps:
            if self.speculative:
                self.carry, toks, emitted = _spec_chunk_program(
                    self.params, self.cfg, self.carry,
                    steps=steps, ngram=self.spec_ngram,
                    k=self.spec_k, eos_id=self.eos_id, pad_id=self.pad_id,
                    shard=self._shard_rows,
                )
            else:
                self.carry, toks, emitted = _decode_chunk_program(
                    self.params, self.cfg, self.carry,
                    steps=steps, eos_id=self.eos_id,
                    pad_id=self.pad_id, sample=self.sampling,
                    shard=self._shard_rows,
                )
            toks.copy_to_host_async()
            emitted.copy_to_host_async()
            self._steps += steps
            for s in self.slots.values():
                s.dispatched += steps
            cur = (toks, emitted)
        if self.overlap:
            self._process(self._prev)
            self._process_embeds(self._prev_embed)
        self._prev = cur
        self._prev_embed = cur_embed
        for slot in list(self._draining):
            self._draining[slot] -= 1
            if self._draining[slot] <= 0:
                del self._draining[slot]
        return n_active

    def run(self, requests: Sequence[Request] = ()) -> List[Completion]:
        """Serve until queue and pool drain; returns generation
        completions in finish order. Accepts a mix of Request and
        EmbedRequest — embeddings are drained with take_embeddings()."""
        for r in requests:
            if isinstance(r, EmbedRequest):
                self.submit_embed(r)
            else:
                self.submit(r)
        while (self.queue or self.slots or self._pending
               or self._prev is not None or self.embed_queue
               or self._prev_embed is not None):
            self.step()
        out, self.finished = self.finished, []
        return out
