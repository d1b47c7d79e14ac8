"""FSST — Fast Static Symbol Table string compression.

Independent pure-Python implementation of the published algorithm (Boncz,
Neumann, Leis: "FSST: Fast Random Access String Compression", PVLDB 13(3),
2019). The reference embeds the authors' C library and uses it as its
signature string scheme (scheme/string/Fsst.cpp:17-127; dictionary pools are
also FSST-compressed, scheme/string/DynamicDictionary.cpp:69-152).

Model, exactly as published:
  * a static table of at most 254 symbols, each a byte sequence of length
    1..8; code 255 is the escape marker (escape + literal byte = 2 bytes out
    for 1 byte in).
  * encoding is greedy longest-match against the table, one output byte per
    matched symbol — random access per string, no cross-string state.
  * the table is trained bottom-up over a few generations: parse a sample
    with the current table, count symbol and concatenated-pair frequencies,
    keep the ``max_symbols`` candidates with the highest gain
    (frequency x length).

Everything is deterministic (stable tie-breaks, fixed sample prefix), so the
same input always yields the same table, sizes, and bytes — required for the
planner's reproducible size estimates and the oracle-checked metadata.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

ESCAPE = 255
MAX_SYMBOLS = 254
MAX_SYMBOL_LEN = 8
_TRAIN_GENERATIONS = 5
_TRAIN_CAP_BYTES = 1 << 16  # train on at most 64 KiB of sample text


@dataclass
class SymbolTable:
    symbols: list[bytes]  # code i encodes symbols[i]

    def __post_init__(self):
        self.lookup = {s: i for i, s in enumerate(self.symbols)}
        # candidate match lengths per leading byte, longest first — the
        # greedy encoder probes only lengths that can actually match
        by_first: dict[int, set[int]] = {}
        for s in self.symbols:
            by_first.setdefault(s[0], set()).add(len(s))
        self.lens_by_first = {b: sorted(ls, reverse=True) for b, ls in by_first.items()}

    def serialized_size(self) -> int:
        """On-disk table cost: 8-byte header + (length byte + payload) per
        symbol — the layout cost model of the C library's export."""
        return 8 + sum(1 + len(s) for s in self.symbols)


def _parse(table: SymbolTable, data: bytes) -> list[bytes]:
    """Greedy longest-match tokenization; unmatched bytes become 1-byte
    escape tokens. Shared by training (to count pairs) and sizing."""
    lookup = table.lookup
    lens_by_first = table.lens_by_first
    tokens: list[bytes] = []
    i, n = 0, len(data)
    while i < n:
        hit = None
        for L in lens_by_first.get(data[i], ()):
            if L <= n - i:
                cand = data[i : i + L]
                if cand in lookup:
                    hit = cand
                    break
        if hit is None:
            tokens.append(data[i : i + 1])
            i += 1
        else:
            tokens.append(hit)
            i += L
    return tokens


def train(strings: list[bytes], max_symbols: int = MAX_SYMBOLS) -> SymbolTable:
    """Bottom-up symbol table construction on a bounded sample prefix.
    Symbols never span string boundaries (per-string random access)."""
    sample: list[bytes] = []
    budget = _TRAIN_CAP_BYTES
    for s in strings:
        if budget <= 0:
            break
        if s:
            sample.append(s[:budget])
            budget -= len(s)

    table = SymbolTable([])
    for _ in range(_TRAIN_GENERATIONS):
        gain: Counter[bytes] = Counter()
        for s in sample:
            tokens = _parse(table, s)
            for t in tokens:
                gain[t] += len(t)
            for a, b in zip(tokens, tokens[1:]):
                if len(a) + len(b) <= MAX_SYMBOL_LEN:
                    gain[a + b] += len(a) + len(b)
        # escapes make 1-byte symbols worth having only when frequent, but
        # gain already orders by total bytes covered; stable tie-break on the
        # symbol bytes keeps the table deterministic
        best = sorted(gain.items(), key=lambda kv: (-kv[1], kv[0]))[:max_symbols]
        table = SymbolTable([s for s, _ in best])
    return table


def compress(table: SymbolTable, data: bytes) -> bytes:
    """Encode one string: one byte per matched symbol, ESCAPE + literal for
    uncovered bytes."""
    lookup = table.lookup
    lens_by_first = table.lens_by_first
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        code = None
        for L in lens_by_first.get(data[i], ()):
            if L <= n - i:
                code = lookup.get(data[i : i + L])
                if code is not None:
                    break
        if code is None:
            out.append(ESCAPE)
            out.append(data[i])
            i += 1
        else:
            out.append(code)
            i += L
    return bytes(out)


def decompress(table: SymbolTable, codes: bytes) -> bytes:
    symbols = table.symbols
    out = bytearray()
    i, n = 0, len(codes)
    while i < n:
        c = codes[i]
        if c == ESCAPE:
            out.append(codes[i + 1])
            i += 2
        else:
            out += symbols[c]
            i += 1
    return bytes(out)


def serialize(table: SymbolTable) -> bytes:
    """Wire format: u8 symbol count, then (u8 length + payload) per symbol —
    the btr-file table layout shape (one table per column chunk)."""
    out = bytearray([len(table.symbols)])
    for s in table.symbols:
        out.append(len(s))
        out += s
    return bytes(out)


def deserialize(blob: bytes) -> SymbolTable:
    count, i, symbols = blob[0], 1, []
    for _ in range(count):
        ln = blob[i]
        symbols.append(blob[i + 1 : i + 1 + ln])
        i += 1 + ln
    return SymbolTable(symbols)


def estimate_compressed_size(data: bytes, encode_cap: int = 1 << 17) -> int:
    """Deterministic size estimate for a byte pool: train on the prefix,
    encode up to ``encode_cap`` bytes, scale the ratio to the full pool.
    Used for dictionary-pool sizing (the reference FSST-compresses dict
    pools >= 16 KiB, DynamicDictionary.cpp:54-56) where an exact encode of a
    multi-MiB pool would be wasted work for a cost model."""
    if not data:
        return 0
    table = train([data])
    probe = data[:encode_cap]
    enc = len(compress(table, probe))
    ratio = max(len(probe) / max(enc, 1), 1e-9)
    return int(len(data) / ratio) + table.serialized_size()
