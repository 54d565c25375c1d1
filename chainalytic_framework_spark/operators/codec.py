"""Gorilla-style codec: delta-of-delta timestamps + XOR float packing.

Pure NumPy bit-twiddling (public Gorilla paper: Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015).
No Spark dependency here; Spark integration (mapInArrow over cold-tier
series) lives in ``cold_store.py``.

Encoding (vectorized — no per-point Python in the encode path; the
batch form ``encode_series_many`` additionally removes per-SERIES
numpy-call overhead — flat classification + one bit-position-sliced
scatter-pack per chunk, byte-identical blobs, 5× on the short-series
cold shape):

- Timestamps (int64 epoch seconds): first absolute, then delta-of-delta
  with the paper's 4-class prefix code:
      dod == 0                  -> '0'
      dod in [-63, 64]          -> '10'  + 7  bits (zigzag-ish offset)
      dod in [-255, 256]        -> '110' + 9  bits
      dod in [-2047, 2048]      -> '1110'+ 12 bits
      else                      -> '1111'+ 64 bits (raw)
- Values (float64 via uint64 bit pattern): XOR with previous value;
      xor == 0 -> '0'
      else     -> '11' + 5-bit leading-zero count (capped 31)
                       + 6-bit significant-bit length + those bits.
  Deviation from the paper, documented: the '10' (reuse previous
  leading/trailing window) branch is never EMITTED — window reuse makes
  encoding sequentially dependent and kills vectorization; always
  emitting the explicit-window form costs a few % compression and keeps
  the bitstream inside the Gorilla code space. The decoder still
  accepts both forms.

Decoding: within ONE blob, code boundaries depend on code contents —
irreducibly sequential. But the cold-read unit of work is never one
blob: ``cold_store.decode_cold`` hands each Arrow batch hundreds of
(url, measure) blobs. ``decode_series_many`` therefore TRANSPOSES the
loop (VERDICT r2 item 3): one bit-cursor per blob, all cursors advance
in lock-step, and each round classifies + extracts one code for every
active blob with pure vectorized numpy (two-word window gathers,
elementwise shifts — no per-bit or per-point Python). Per-round
interpreter overhead amortizes over the batch width, so throughput is
~n×K points per K rounds; the sequentially-dependent '10' window-reuse
form costs nothing because prev-lead/prev-sig are just two more
vectors. Reconstruction (dod → delta → ts; xor-chain → values) is
segmented cumsum / segmented xor-scan over the flat output — also
fully vectorized. Zero-code runs (regular buckets, constant values)
collapse up to 64 codes into one round via a CLZ lookup. Measured
5–17 Mpt/s vs ~1–2.5 Mpt/s sequential (4.5–7× — BENCH/BASELINE.md
codec line; batches are additionally decoded in parallel across Spark
tasks, which is where the other order of magnitude lives at scale). Single-blob
``decode_series`` keeps the one-window-per-point sequential decoders
(transposing a batch of one would only add overhead). NaN, ±0.0,
constant runs, and single-point series round-trip exactly (bit-pattern
equality; tests/test_codec.py property-tests this, plus
transposed-vs-sequential equality on the same streams).

Reference analogue: none — the reference stores raw JSON per height
(``zones/public-icon/warehouse/storage.py:125-126``); compression is a
north-rule addition (SURVEY.md §2.11).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"GOR1"

# ---------------------------------------------------------------------------
# bit packing: rows of (code value ≤128 bits as hi/lo uint64, bit length)
# ---------------------------------------------------------------------------


def _pack_codes(hi: np.ndarray, lo: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack variable-length MSB-first codes into a byte stream.

    Expands each ≤128-bit code into a (n, 128) bit matrix, selects the
    valid low ``nbits`` of each row, and packbits the concatenation —
    O(n·128) bits of temp memory, fully vectorized.
    """
    n = len(nbits)
    if n == 0:
        return b""
    shifts_lo = np.arange(63, -1, -1, dtype=np.uint64)
    bits_hi = (hi[:, None] >> shifts_lo[None, :]) & np.uint64(1)
    bits_lo = (lo[:, None] >> shifts_lo[None, :]) & np.uint64(1)
    bits = np.concatenate([bits_hi, bits_lo], axis=1).astype(np.uint8)  # (n,128) MSB-first
    # valid bits of row i are the last nbits[i] columns
    cols = np.arange(128)
    mask = cols[None, :] >= (128 - nbits[:, None])
    stream = bits[mask]  # row-major selection keeps order
    return np.packbits(stream).tobytes()


class _BitReader:
    """MSB-first bit view over 64-bit big-endian words: the decoders
    index ``words`` directly with their own cursor math (128-bit
    windows spanning the two words under the cursor — no per-bit loop).
    The buffer is zero-padded three words past the end so a window read
    at the last logical bit never falls off the list."""

    __slots__ = ("words",)

    def __init__(self, data: bytes):
        pad = (-len(data)) % 8 + 24  # +3 words: a window may span past the end
        buf = data + b"\x00" * pad
        self.words = np.frombuffer(buf, dtype=">u8").tolist()


# ---------------------------------------------------------------------------
# timestamps: delta-of-delta
# ---------------------------------------------------------------------------

_TS_CLASSES = (
    (64, 7, 0b10, 2),       # [-63, 64]   -> '10'  + 7
    (256, 9, 0b110, 3),     # [-255, 256] -> '110' + 9
    (2048, 12, 0b1110, 4),  # [-2047,2048]-> '1110'+ 12
)


def _encode_ts(ts: np.ndarray) -> bytes:
    ts = ts.astype(np.int64)
    if len(ts) <= 1:
        return b""
    delta = np.diff(ts)
    # dod_i = delta_i - delta_{i-1}, with implicit delta_{-1} = 0
    dod = (delta - np.concatenate([[0], delta[:-1]])).astype(np.int64)
    return _pack_codes(*_ts_code_fields(dod))


def _decode_ts(data: bytes, n: int, first_ts: int) -> np.ndarray:
    """Decode delta-of-deltas. Per point: ONE 4-bit peek classifies the
    prefix, then one value read — no bit-at-a-time probing. The doubly-
    cumulative reconstruction (dod → delta → ts) is vectorized numpy."""
    out = np.empty(n, dtype=np.int64)
    out[0] = first_ts
    if n == 1:
        return out
    words = _BitReader(data).words  # zero-padded big-endian word list
    pos = 0
    dod = np.zeros(n - 1, dtype=np.int64)
    for i in range(n - 1):
        # one window grab classifies the prefix AND carries the value
        # bits for every class but the 68-bit raw one (max 16 bits)
        w, off = pos >> 6, pos & 63
        win = (((words[w] << 64) | words[w + 1]) >> (112 - off)) & 0xFFFF  # next 16 bits
        if win < 0b1000_0000_0000_0000:  # '0'
            pos += 1
        elif win < 0b1100_0000_0000_0000:  # '10' + 7
            dod[i] = ((win >> 7) & 0x7F) - 63
            pos += 9
        elif win < 0b1110_0000_0000_0000:  # '110' + 9
            dod[i] = ((win >> 4) & 0x1FF) - 255
            pos += 12
        elif win < 0b1111_0000_0000_0000:  # '1110' + 12
            dod[i] = (win & 0xFFF) - 2047
            pos += 16
        else:  # '1111' + 64 raw (spans ≤3 words)
            pos += 4
            w, off = pos >> 6, pos & 63
            v = (
                ((words[w] << 128) | (words[w + 1] << 64) | words[w + 2])
                >> (128 - off)
            ) & 0xFFFFFFFFFFFFFFFF
            dod[i] = v - (1 << 64) if v >= (1 << 63) else v
            pos += 64
    # delta_i = Σ dod (implicit delta_{-1}=0); ts_i = first + Σ delta
    np.cumsum(dod, out=dod)
    out[1:] = first_ts + np.cumsum(dod)
    return out


# ---------------------------------------------------------------------------
# values: XOR
# ---------------------------------------------------------------------------


def _encode_vals(bits64: np.ndarray) -> bytes:
    """bits64: uint64 view of the value stream (first value excluded)."""
    if len(bits64) <= 1:
        return b""
    x = bits64[1:] ^ bits64[:-1]
    return _pack_codes(*_val_code_fields(x))


def _decode_vals(data: bytes, n: int, first_bits: int) -> np.ndarray:
    """Decode XOR codes. Per point: one 2-bit peek classifies, one read
    fetches (lead, sig) + meaningful bits; the running-XOR
    reconstruction is a vectorized ``np.bitwise_xor.accumulate``."""
    if n == 1:
        return np.array([first_bits], dtype=np.uint64)
    words = _BitReader(data).words  # zero-padded big-endian word list
    pos = 0
    xors = np.zeros(n, dtype=np.uint64)
    xors[0] = first_bits
    prev_lead, prev_sig = 0, 0
    mask64 = (1 << 64) - 1
    for i in range(1, n):
        # one 13-bit window grab covers prefix + (lead, sig) head
        w, off = pos >> 6, pos & 63
        win = (((words[w] << 64) | words[w + 1]) >> (115 - off)) & 0x1FFF  # next 13 bits
        if win < 0b1_0000_0000_0000:  # '0' → xor 0
            pos += 1
            continue
        if win < 0b1_1000_0000_0000:  # '10': window-reuse (decoder support)
            pos += 2
            lead, sig = prev_lead, prev_sig
        else:  # '11' + 5-bit lead + 6-bit sig
            lead = (win >> 6) & 0x1F
            sig = (win & 63) or 64
            prev_lead, prev_sig = lead, sig
            pos += 13
        w, off = pos >> 6, pos & 63
        m = (
            ((words[w] << 128) | (words[w + 1] << 64) | words[w + 2])
            >> (192 - off - sig)
        ) & ((1 << sig) - 1)
        pos += sig
        xors[i] = (m << (64 - lead - sig)) & mask64
    return np.bitwise_xor.accumulate(xors)


# ---------------------------------------------------------------------------
# batch encode: all series' codes classified flat, packed by one
# global bit-scatter (streams stay byte-identical to encode_series)
# ---------------------------------------------------------------------------


def _code_pair_idx(ns: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For flat point arrays with segment lengths ``ns``: (left, right)
    point indices of every consecutive pair within a segment, plus the
    code-domain start index of each segment."""
    total_n = int(ns.sum())
    seg_start = np.concatenate([[0], np.cumsum(ns)[:-1]])
    is_start = np.zeros(total_n, dtype=bool)
    is_start[seg_start[ns > 0]] = True
    right = np.flatnonzero(~is_start)  # every point except segment firsts
    m = np.maximum(ns - 1, 0)
    code_seg_start = np.concatenate([[0], np.cumsum(m)[:-1]])
    return right - 1, right, code_seg_start


def _ts_code_fields(dod: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hi, lo, nbits) for a flat dod array — the same class math as
    ``_encode_ts``, already elementwise."""
    hi = np.zeros(len(dod), dtype=np.uint64)
    lo = np.zeros(len(dod), dtype=np.uint64)
    nbits = np.ones(len(dod), dtype=np.int64)  # '0' default
    done = dod == 0
    for bound, vbits, prefix, pbits in _TS_CLASSES:
        sel = (~done) & (dod >= -(bound - 1)) & (dod <= bound)
        enc = (dod[sel] + (bound - 1)).astype(np.uint64)
        lo[sel] = (np.uint64(prefix) << np.uint64(vbits)) | enc
        nbits[sel] = pbits + vbits
        done |= sel
    rest = ~done
    if rest.any():
        hi[rest] = np.uint64(0b1111)
        lo[rest] = dod[rest].view(np.uint64)
        nbits[rest] = 68
    return hi, lo, nbits


def _val_code_fields(x: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hi, lo, nbits) for a flat xor array — the ``_encode_vals``
    class math, elementwise."""
    n = len(x)
    hi = np.zeros(n, dtype=np.uint64)
    lo = np.zeros(n, dtype=np.uint64)
    nbits = np.ones(n, dtype=np.int64)
    nz = x != 0
    if nz.any():
        xv = x[nz]
        # branchless halving clz/ctz: full-array where-selects beat
        # masked compress/scatter ~3× at this width
        v = xv
        clz = np.zeros(len(xv), dtype=np.uint64)
        for shift in (32, 16, 8, 4, 2, 1):
            m_ = (v >> np.uint64(shift)) == 0
            clz += m_.astype(np.uint64) * np.uint64(shift)
            v = np.where(m_, v, v >> np.uint64(shift))
        t = xv
        ctz = np.zeros(len(xv), dtype=np.uint64)
        for shift in (32, 16, 8, 4, 2, 1):
            m_ = (t << np.uint64(64 - shift)) == 0
            ctz += m_.astype(np.uint64) * np.uint64(shift)
            t = np.where(m_, t >> np.uint64(shift), t)
        lead = np.minimum(clz, 31).astype(np.uint64)
        meaningful = np.where(ctz < 64, xv >> ctz, np.uint64(0))
        sig_w = np.uint64(64) - lead - ctz
        sig_field = np.where(sig_w == 64, np.uint64(0), sig_w)
        head = (np.uint64(0b11) << np.uint64(11)) | (lead << np.uint64(6)) | sig_field
        h = np.where(sig_w > 51, head >> (np.uint64(64) - sig_w), np.uint64(0))
        lo_nz = np.where(sig_w < 64, (head << sig_w) | meaningful, meaningful)
        h = np.where(sig_w == 64, head, h)
        hi[nz] = h
        lo[nz] = lo_nz
        nbits[nz] = 13 + sig_w.astype(np.int64)
    return hi, lo, nbits


def _seg_sums(x: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-segment sums of flat ``x`` (segment i holds counts[i]
    consecutive elements; zero-length segments sum to 0)."""
    if len(x) == 0:
        return np.zeros(len(counts), dtype=np.int64)
    c = np.cumsum(x)
    ends = np.cumsum(counts) - 1  # -1 for empty-prefix segments
    run = np.where(ends >= 0, c[np.maximum(ends, 0)], 0)
    run[ends < 0] = 0
    return run - np.concatenate([[0], run[:-1]])


def _pack_codes_many(
    hi: np.ndarray, lo: np.ndarray, nbits: np.ndarray, m: np.ndarray,
    chunk_codes: int = 1 << 19,
) -> tuple[bytes, np.ndarray]:
    """Pack each series' codes into its own byte-aligned stream with ONE
    bit-scatter + packbits per chunk. Returns (concatenated streams,
    per-series byte lengths). Bit layout per stream is identical to
    ``_pack_codes`` (MSB-first codes, zero-padded final byte)."""
    n_series = len(m)
    stream_bytes = np.zeros(n_series, dtype=np.int64)
    out_parts: list[bytes] = []
    # chunk on series boundaries so every series' stream lives in one pass
    s0 = 0
    code0 = 0
    csum = np.cumsum(m)
    while s0 < n_series:
        s1 = s0
        while s1 < n_series and (csum[s1] - code0) <= chunk_codes:
            s1 += 1
        s1 = max(s1, s0 + 1)
        mc = m[s0:s1]
        k0, k1 = code0, int(csum[s1 - 1])
        hi_c, lo_c, nb = hi[k0:k1], lo[k0:k1], nbits[k0:k1]
        # per-code start bit within its series: global exclusive cumsum
        # minus its value at the series' first code (safe for
        # zero-code series — their entry value is never consumed)
        excl = np.concatenate([[0], np.cumsum(nb)[:-1]]) if len(nb) else np.zeros(0, np.int64)
        css = np.concatenate([[0], np.cumsum(mc)[:-1]]).astype(np.int64)
        if len(excl):
            entry = excl[np.minimum(css, len(excl) - 1)]
        else:
            entry = np.zeros(len(mc), dtype=np.int64)
        code_start = excl - _seg_repeat(entry, mc)
        L = _seg_sums(nb, mc)  # bit length per series
        B = (L + 7) // 8
        stream_bytes[s0:s1] = B
        base_bits = 8 * np.concatenate([[0], np.cumsum(B)[:-1]])
        target_base = _seg_repeat(base_bits, mc) + code_start
        if len(nb):
            # scatter one BIT POSITION per pass: pass r writes the bit
            # at LSB-offset r of every code that has one. Codes are
            # pre-sorted by length so pass r is a SLICE (no per-pass
            # boolean mask over all codes) — total work is Σ nbits, the
            # stream's actual bit count
            outbits = np.zeros(int(8 * B.sum()), dtype=np.uint8)
            asc = np.argsort(nb, kind="stable")
            nb_a = nb[asc].astype(np.int64)
            lo_a, hi_a = lo_c[asc], hi_c[asc]
            tb_a = target_base[asc]
            W = int(nb_a[-1])
            for r in range(W):
                k = np.searchsorted(nb_a, r, side="right")
                src = lo_a[k:] if r < 64 else hi_a[k:]
                rr = np.uint64(r if r < 64 else r - 64)
                bit = ((src >> rr) & np.uint64(1)).astype(np.uint8)
                outbits[tb_a[k:] + (nb_a[k:] - 1 - r)] = bit
            out_parts.append(np.packbits(outbits).tobytes())
        s0, code0 = s1, k1
    return b"".join(out_parts), stream_bytes


def encode_series_many(
    ts_flat: np.ndarray, vals_flat: np.ndarray, ns: np.ndarray
) -> list[bytes]:
    """Batch encode: blob i covers points ``offsets[i]:offsets[i+1]``
    of the flat arrays (``offsets`` = cumsum of ``ns``). Byte-identical
    to per-series ``encode_series`` (tested), but all code
    classification and bit packing run ONCE over the whole batch —
    per-series cost drops from ~200 µs of numpy-call overhead to the
    header/slice loop only. This is the cold WRITE path: billions of
    short (url, measure) series make per-series overhead the encode
    bottleneck at scale."""
    ts_flat = np.ascontiguousarray(ts_flat, dtype=np.int64)
    vals = np.asarray(vals_flat)
    if vals.dtype == np.float64:
        bits_flat, kind = vals.view(np.uint64), 0
    elif vals.dtype == np.int64:
        bits_flat, kind = vals.view(np.uint64), 1
    else:
        raise TypeError(f"unsupported value dtype {vals.dtype}")
    ns = np.asarray(ns, dtype=np.int64)
    if int(ns.sum()) != len(ts_flat) or len(ts_flat) != len(vals):
        raise ValueError("ns/points length mismatch")
    left, right, _ = _code_pair_idx(ns)
    m = np.maximum(ns - 1, 0)
    code_seg_start = np.concatenate([[0], np.cumsum(m)[:-1]])
    # timestamps: segmented delta → dod
    delta = ts_flat[right] - ts_flat[left]
    prev = np.empty_like(delta)
    if len(delta):
        prev[1:] = delta[:-1]
        prev[0] = 0
    prev[code_seg_start[m > 0]] = 0
    ts_hi, ts_lo, ts_nb = _ts_code_fields(delta - prev)
    ts_stream, ts_len = _pack_codes_many(ts_hi, ts_lo, ts_nb, m)
    # values: segmented xor chain
    x = bits_flat[right] ^ bits_flat[left]
    v_hi, v_lo, v_nb = _val_code_fields(x)
    val_stream, val_len = _pack_codes_many(v_hi, v_lo, v_nb, m)

    seg_start = np.concatenate([[0], np.cumsum(ns)[:-1]])
    ts_off = np.concatenate([[0], np.cumsum(ts_len)])
    val_off = np.concatenate([[0], np.cumsum(val_len)])
    tmv, vmv = memoryview(ts_stream), memoryview(val_stream)
    blobs: list[bytes] = []
    for i in range(len(ns)):
        n = int(ns[i])
        if n == 0:
            blobs.append(_MAGIC + struct.pack("<BIqQII", kind, 0, 0, 0, 0, 0))
            continue
        s = int(seg_start[i])
        header = struct.pack(
            "<BIqQII", kind, n, int(ts_flat[s]), int(bits_flat[s]),
            int(ts_len[i]), int(val_len[i]),
        )
        blobs.append(
            _MAGIC + header
            + bytes(tmv[ts_off[i]:ts_off[i + 1]])
            + bytes(vmv[val_off[i]:val_off[i + 1]])
        )
    return blobs


# ---------------------------------------------------------------------------
# transposed batch decode: one cursor per blob, lock-step rounds
# ---------------------------------------------------------------------------


def _concat_words(streams: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate streams into one native uint64 word array (each
    stream zero-padded to a word boundary +2 guard words so any 64-bit
    window read from a valid cursor stays in bounds). Returns
    (words, start_bit_of_each_stream)."""
    bufs: list[bytes] = []
    base_bits = np.empty(len(streams), dtype=np.int64)
    off_words = 0
    for i, s in enumerate(streams):
        pad = (-len(s)) % 8 + 16
        bufs.append(s)
        bufs.append(b"\x00" * pad)
        base_bits[i] = off_words * 64
        off_words += (len(s) + pad) // 8
    words = np.frombuffer(b"".join(bufs), dtype=">u8").astype(np.uint64)
    return words, base_bits


def _win64(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """The 64 bits starting at each bit cursor, MSB-aligned — two word
    gathers + elementwise shifts (the >>1 >>(63-off) split sidesteps
    numpy's undefined shift-by-64)."""
    w = pos >> 6
    off = (pos & 63).astype(np.uint64)
    return (words[w] << off) | ((words[w + 1] >> np.uint64(1)) >> (np.uint64(63) - off))


def _seg_repeat(per_seg: np.ndarray, counts: np.ndarray) -> np.ndarray:
    return np.repeat(per_seg, counts)


# clz within the top 16 bits (16 when all zero): a '0'-code RUN counter —
# r consecutive leading zero bits ⟺ r consecutive zero-dod / zero-xor
# codes, which the round loop consumes in ONE step (outputs are
# pre-zeroed, so a zero run is pure cursor arithmetic). 64 KB LUT.
_CLZ16 = np.full(65536, 16, dtype=np.int64)
_nz = np.arange(1, 65536)
_CLZ16[_nz] = 15 - np.floor(np.log2(_nz)).astype(np.int64)  # exact: ints < 2^16
del _nz

_TS_ADV = np.array([1] * 8 + [9] * 4 + [12, 12, 16, 68], dtype=np.int64)

_CHUNK_BYTES = 32 << 20  # per-chunk stream budget: bounds worst-case gather span


def _decode_ts_many(streams: list[bytes], ns: np.ndarray, firsts: np.ndarray) -> np.ndarray:
    """Flat concatenated timestamp arrays for many blobs (lengths ns)."""
    total_n = int(ns.sum())
    out = np.empty(total_n, dtype=np.int64)
    seg_start = np.concatenate([[0], np.cumsum(ns)[:-1]])
    nz0 = ns > 0  # zero-point blobs own no slot (their seg_start aliases the next)
    out[seg_start[nz0]] = firsts[nz0]
    m = np.maximum(ns - 1, 0)  # codes per stream
    total_m = int(m.sum())
    if total_m == 0:
        return out
    live = m > 0
    words, base_bits = _concat_words([s for s, a in zip(streams, live) if a])
    dod_off = np.concatenate([[0], np.cumsum(m[live])[:-1]])
    dod_flat = np.empty(total_m, dtype=np.int64)
    dod_flat.fill(0)  # zero runs are consumed without writing
    pos, remaining, outp = base_bits, m[live].copy(), dod_off.copy()
    while len(pos):
        cur = _win64(words, pos)
        # run skip: r leading zero bits = r consecutive zero-dod codes
        # (a fully-zero window consumes 64 codes in one round)
        run = np.minimum(
            np.where(cur == 0, 64, _CLZ16[(cur >> np.uint64(48)).astype(np.int64)]),
            remaining,
        )
        nzl = run == 0  # lanes whose next code is non-zero-class
        if nzl.any():
            win4 = (cur >> np.uint64(60)).astype(np.int64)
            v7 = ((cur >> np.uint64(55)) & np.uint64(0x7F)).astype(np.int64) - 63
            v9 = ((cur >> np.uint64(52)) & np.uint64(0x1FF)).astype(np.int64) - 255
            v12 = ((cur >> np.uint64(48)) & np.uint64(0xFFF)).astype(np.int64) - 2047
            dod = np.where(win4 < 12, v7, np.where(win4 < 14, v9, v12))
            c4 = win4 == 15
            if c4.any():
                dod[c4] = _win64(words, pos[c4] + 4).view(np.int64)
            dod_flat[outp[nzl]] = dod[nzl]
            step = np.where(nzl, _TS_ADV[win4], run)
            took = np.where(nzl, 1, run)
        else:
            step = took = run
        pos = pos + step
        outp += took
        remaining = remaining - took
        alive = remaining > 0
        if not alive.all():
            pos, remaining, outp = pos[alive], remaining[alive], outp[alive]
    # dod → delta → ts: two segmented cumsums (global cumsum minus the
    # running total at each segment's entry; corrections fused into one
    # repeat each)
    mm = m[live]
    ends = np.cumsum(mm)[:-1] - 1
    c = np.cumsum(dod_flat)
    entry = np.concatenate([[0], c[ends]])
    delta = c - _seg_repeat(entry, mm)
    c2v = np.cumsum(delta)
    entry2 = np.concatenate([[0], c2v[ends]])
    rest = c2v + _seg_repeat(firsts[live] - entry2, mm)
    mask = np.ones(total_n, dtype=bool)
    mask[seg_start[nz0]] = False
    out[mask] = rest
    return out


def _decode_vals_many(streams: list[bytes], ns: np.ndarray, first_bits: np.ndarray) -> np.ndarray:
    """Flat concatenated uint64 value-bit arrays for many blobs."""
    total_n = int(ns.sum())
    x_flat = np.zeros(total_n, dtype=np.uint64)  # firsts at starts, XORs after
    if total_n == 0:
        return x_flat
    seg_start = np.concatenate([[0], np.cumsum(ns)[:-1]])
    nz0 = ns > 0
    x_flat[seg_start[nz0]] = first_bits[nz0]
    m = np.maximum(ns - 1, 0)
    if int(m.sum()) > 0:
        live = m > 0
        words, base_bits = _concat_words([s for s, a in zip(streams, live) if a])
        # output index of code j of live stream i = its segment start + 1 + j
        outp = (seg_start[live] + 1).copy()
        pos, remaining = base_bits, m[live].copy()
        prev_lead = np.zeros(len(pos), dtype=np.uint64)
        prev_sig = np.zeros(len(pos), dtype=np.uint64)
        while len(pos):
            cur = _win64(words, pos)
            # run skip: r leading zero bits = r consecutive zero-xor codes
            # (a fully-zero window consumes 64 codes in one round)
            run = np.minimum(
                np.where(cur == 0, 64, _CLZ16[(cur >> np.uint64(48)).astype(np.int64)]),
                remaining,
            )
            nzl = run == 0
            if nzl.any():
                lead = (cur >> np.uint64(57)) & np.uint64(0x1F)
                sf = (cur >> np.uint64(51)) & np.uint64(0x3F)
                sig = np.where(sf == 0, np.uint64(64), sf)
                head = np.full(len(pos), 13, dtype=np.int64)
                reuse = nzl & ((cur >> np.uint64(62)) == np.uint64(0b10))
                if reuse.any():  # only external encoders emit '10'
                    lead = np.where(reuse, prev_lead, lead)
                    sig = np.where(reuse, prev_sig, sig)
                    head[reuse] = 2
                fresh = nzl & (head == 13)
                prev_lead = np.where(fresh, lead, prev_lead)
                prev_sig = np.where(fresh, sig, prev_sig)
                pay = _win64(words, pos + head)
                sg_c = np.minimum(sig, np.uint64(63))
                mean = np.where(  # top sig bits of pay; sig=64 → pay itself
                    sig == 64, pay, (pay >> np.uint64(1)) >> (np.uint64(63) - sg_c)
                )
                shift = np.uint64(64) - lead - sig  # trailing zeros ≤ 63
                xor = mean << shift
                x_flat[outp[nzl]] = xor[nzl]
                step = np.where(nzl, head + sig.astype(np.int64), run)
                took = np.where(nzl, 1, run)
            else:
                step = took = run
            pos = pos + step
            outp += took
            remaining = remaining - took
            alive = remaining > 0
            if not alive.all():
                pos, remaining, outp = pos[alive], remaining[alive], outp[alive]
                prev_lead, prev_sig = prev_lead[alive], prev_sig[alive]
    # segmented xor-scan: xor is self-inverse, so segment value =
    # global scan ^ global scan at the bit before the segment
    acc = np.bitwise_xor.accumulate(x_flat)
    # a segment starting at 0 (leading zero-point blobs) has entry 0,
    # not acc[-1]
    entry = np.concatenate(
        [[np.uint64(0)],
         np.where(seg_start[1:] == 0, np.uint64(0), acc[seg_start[1:] - 1])]
    )
    return acc ^ _seg_repeat(entry, ns)


def decode_series_many(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch decode: returns (offsets, ts_flat, vals_flat) where blob i's
    points are rows offsets[i]:offsets[i+1]. All blobs must share one
    value kind (the cold store stores int64 measures). This is the cold
    read path at scale — per-round work is vectorized across the whole
    batch; Python cost is O(max points per blob), not O(total points)."""
    if not blobs:
        e = np.array([], dtype=np.int64)
        return np.zeros(1, dtype=np.int64), e, e.copy()
    # chunk so each chunk's word arrays stay cache-resident: the round
    # loop's window gathers are effectively random across the batch, and
    # past ~L3 size they fall off a memory cliff (measured 7×)
    if len(blobs) > 1:
        total_bytes = sum(len(b) for b in blobs)
        if total_bytes > _CHUNK_BYTES:
            n_chunks = -(-total_bytes // _CHUNK_BYTES)
            per = -(-len(blobs) // n_chunks)
            parts = [
                decode_series_many(blobs[i : i + per])
                for i in range(0, len(blobs), per)
            ]
            offs = [p[0] for p in parts]
            shifts = np.cumsum([0] + [o[-1] for o in offs[:-1]])
            offsets = np.concatenate(
                [offs[0]] + [o[1:] + s for o, s in zip(offs[1:], shifts[1:])]
            )
            return (
                offsets,
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
            )
    ns = np.empty(len(blobs), dtype=np.int64)
    firsts = np.empty(len(blobs), dtype=np.int64)
    fbits = np.empty(len(blobs), dtype=np.uint64)
    ts_streams: list[bytes] = []
    val_streams: list[bytes] = []
    kinds = set()
    hlen = struct.calcsize("<BIqQII")
    for i, blob in enumerate(blobs):
        if bytes(blob[:4]) != _MAGIC:
            raise ValueError("bad magic")
        kind, n, first_ts, first_bits, ts_len, val_len = struct.unpack_from("<BIqQII", blob, 4)
        kinds.add(kind)
        ns[i], firsts[i], fbits[i] = n, first_ts, first_bits
        off = 4 + hlen
        ts_streams.append(blob[off : off + ts_len])
        val_streams.append(blob[off + ts_len : off + ts_len + val_len])
    if len(kinds) > 1:
        raise ValueError("mixed value kinds in one batch")
    ts_flat = _decode_ts_many(ts_streams, ns, firsts)
    bits_flat = _decode_vals_many(val_streams, ns, fbits)
    vals_flat = bits_flat.view(np.float64) if kinds == {0} else bits_flat.view(np.int64)
    offsets = np.concatenate([[0], np.cumsum(ns)])
    return offsets, ts_flat, vals_flat


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def encode_series(ts_seconds: np.ndarray, values: np.ndarray) -> bytes:
    """Encode a sorted int64-seconds timestamp array + float64/int64 value
    array into one self-describing blob."""
    ts = np.asarray(ts_seconds, dtype=np.int64)
    vals = np.asarray(values)
    if vals.dtype == np.float64:
        bits = vals.view(np.uint64)
        kind = 0
    elif vals.dtype == np.int64:
        bits = vals.view(np.uint64)
        kind = 1
    else:
        raise TypeError(f"unsupported value dtype {vals.dtype}")
    if len(ts) != len(vals):
        raise ValueError("ts/vals length mismatch")
    n = len(ts)
    if n == 0:
        return _MAGIC + struct.pack("<BIqQII", kind, 0, 0, 0, 0, 0)
    ts_stream = _encode_ts(ts)
    val_stream = _encode_vals(bits)
    header = struct.pack(
        "<BIqQII", kind, n, int(ts[0]), int(bits[0]), len(ts_stream), len(val_stream)
    )
    return _MAGIC + header + ts_stream + val_stream


def decode_series(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    if bytes(blob[:4]) != _MAGIC:
        raise ValueError("bad magic")
    kind, n, first_ts, first_bits, ts_len, val_len = struct.unpack_from("<BIqQII", blob, 4)
    off = 4 + struct.calcsize("<BIqQII")
    if n == 0:
        empty_vals = np.array([], dtype=np.float64 if kind == 0 else np.int64)
        return np.array([], dtype=np.int64), empty_vals
    ts_stream = blob[off : off + ts_len]
    val_stream = blob[off + ts_len : off + ts_len + val_len]
    ts = _decode_ts(ts_stream, n, first_ts)
    bits = _decode_vals(val_stream, n, first_bits)
    vals = bits.view(np.float64) if kind == 0 else bits.view(np.int64)
    return ts, vals
