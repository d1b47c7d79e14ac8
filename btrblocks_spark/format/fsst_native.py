"""Optional C fast path for the FSST codec (format/fsst.py).

The reference embeds the authors' C FSST library and gets GB/s-class
string codec throughput (scheme/string/Fsst.cpp:17-80). Pure Python tops
out around 1 MB/s and vectorized NumPy around 10 MB/s, which makes FSST
the write-path bottleneck for string-heavy columns. This module compiles a
small, self-contained C kernel (our own implementation of the published
greedy longest-match algorithm — NOT the reference's vendored library) via
cffi at first use and caches the shared object under ``~/.cache``.

Everything is best-effort: no compiler, no cffi, or any build error →
``lib`` stays None and callers fall back to the NumPy batch path. Output
is byte-for-byte identical to fsst.compress (tested in test_fsst.py).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

_CDEF = """
int64_t fsst_encode_batch(
    const uint8_t *sym_bytes, const uint8_t *sym_lens, int nsym,
    const uint8_t *buf, const int64_t *str_off, int64_t nstr,
    uint8_t *out, int64_t out_cap, int64_t *out_off);
int64_t fsst_decode_batch(
    const uint8_t *sym_bytes, const uint8_t *sym_lens, int nsym,
    const uint8_t *buf, const int64_t *str_off, int64_t nstr,
    uint8_t *out, int64_t out_cap, int64_t *out_off);
int64_t fsst_parse_tokens(
    const uint8_t *sym_bytes, const uint8_t *sym_lens, int nsym,
    const uint8_t *buf, const int64_t *str_off, int64_t nstr,
    int16_t *toks, int64_t cap);
"""

_SOURCE = r"""
#include <stdint.h>
#include <string.h>

#define ESCAPE 255
#define MAX_SYMS 255

typedef struct {
    uint64_t val;   /* big-endian symbol bytes, left-aligned in 64 bits */
    uint64_t mask;  /* high len*8 bits set */
    uint8_t len;
    uint8_t code;
} Sym;

/* Single-lookup matcher (the published fsst shortCodes design, Boncz/
 * Neumann/Leis PVLDB'19 §4): shortCodes[first-2-bytes] packs the ENTIRE
 * len<=2 decision — best len-2 symbol, else the first byte's len-1
 * symbol, else escape — into one uint32, so the common path is one table
 * load + arithmetic. Symbols of len>=3 are rare per prefix: their
 * candidates live in a compact sentinel-terminated group (sorted len
 * desc, so the first masked hit IS the greedy longest match) reached only
 * when the shortCodes entry carries a group pointer.
 *
 * shortCodes packing: bits 0-7 code (ESCAPE for the escape action), bits
 * 8-11 input advance (1 or 2), bit 14 escape flag, bit 15 "len>=3
 * candidates exist for this 2-byte prefix" (the long path then hash-keys
 * on the FIRST THREE bytes — all len>=3 candidates at a position share
 * its exact 3-byte prefix, so one bucket holds every possible match,
 * sorted len desc; 2-byte grouping degenerated to ~7-entry linear scans
 * on low-alphabet text). byte1[] is the same packing for the rem==1 tail.
 *
 * The emit is BRANCHLESS (the paper's avoidBranch device): always write
 * the action code AND the literal byte, then advance the output cursor
 * by 1 + escape-bit — a mispredicted escape/no-escape branch per token
 * (data-dependent, ~50% on mixed text) costs more than the always-write.
 * The overwrite slack is covered by the encode capacity contract
 * (out_cap >= 2 bytes per input byte + 16). */
#define SC_ESC (1u << 14)
#define SC_LONG (1u << 15)
#define SC_ADV(sc) (((sc) >> 8) & 0xFu)
#define HSLOTS 2048 /* open-addressed 3-byte-key buckets, <=254 occupied */

static inline uint32_t hash3(uint32_t key) {
    return (key * 2654435761u) >> 21; /* 11 bits */
}

typedef struct {
    uint32_t shortCodes[65536];
    uint32_t byte1[256];
    uint32_t hkey[HSLOTS];   /* 3-byte key + 1, 0 = empty */
    uint16_t hstart[HSLOTS]; /* start index into longSyms */
    Sym longSyms[2 * MAX_SYMS + 2]; /* <=254 entries + one sentinel/group */
} Table;

static void build_table(const uint8_t *sym_bytes, const uint8_t *sym_lens,
                        int nsym, Table *t) {
    /* pass 1: len-1 actions (default escape; code field holds ESCAPE so
     * the branchless emit writes the right first byte either way) */
    const uint8_t *p = sym_bytes;
    for (int b = 0; b < 256; b++)
        t->byte1[b] = SC_ESC | (1u << 8) | ESCAPE;
    for (int i = 0; i < nsym; i++) {
        if (sym_lens[i] == 1) t->byte1[p[0]] = (1u << 8) | (uint32_t)i;
        p += sym_lens[i];
    }
    /* pass 2: every 2-byte window defaults to its first byte's action */
    for (int g = 0; g < 65536; g++) t->shortCodes[g] = t->byte1[g >> 8];
    p = sym_bytes;
    for (int i = 0; i < nsym; i++) {
        if (sym_lens[i] == 2)
            t->shortCodes[(p[0] << 8) | p[1]] = (2u << 8) | (uint32_t)i;
        p += sym_lens[i];
    }
    /* pass 3: len>=3 candidates as sentinel-terminated runs per distinct
     * FIRST-3-BYTE key (insertion-sorted len desc; equal-length symbols
     * sharing one prefix are distinct byte strings — at most one matches),
     * reached through an open-addressed hash; the 2-byte shortCodes entry
     * only carries a "worth probing" flag. All len>=3 candidates at an
     * input position share its exact 3-byte prefix, so ONE bucket holds
     * every possible match. Group discovery is a tiny O(nsym * ngroups)
     * scan: nsym <= 254. */
    int32_t head[MAX_SYMS];  /* group start per distinct 3-byte key */
    int32_t gkey[MAX_SYMS];
    int cnt[MAX_SYMS];
    int ngroups = 0, fill = 0;
    p = sym_bytes;
    for (int i = 0; i < nsym; i++) {
        int L = sym_lens[i];
        if (L < 3) { p += L; continue; }
        int key = (p[0] << 16) | (p[1] << 8) | p[2];
        int gi = -1;
        for (int k = 0; k < ngroups; k++)
            if (gkey[k] == key) { gi = k; break; }
        if (gi < 0) {
            gi = ngroups++;
            gkey[gi] = key;
            cnt[gi] = 0;
        }
        cnt[gi]++;
        p += L;
    }
    for (int k = 0; k < ngroups; k++) {
        head[k] = fill;
        fill += cnt[k] + 1;            /* + sentinel */
        t->longSyms[fill - 1].len = 0; /* sentinel */
        cnt[k] = 0;                    /* reused as per-group fill */
    }
    p = sym_bytes;
    for (int i = 0; i < nsym; i++) {
        int L = sym_lens[i];
        if (L < 3) { p += L; continue; }
        int key = (p[0] << 16) | (p[1] << 8) | p[2];
        int gi = 0;
        for (int k = 0; k < ngroups; k++)
            if (gkey[k] == key) { gi = k; break; }
        uint64_t v = 0;
        for (int j = 0; j < L; j++) v = (v << 8) | p[j];
        v <<= (8 - L) * 8;
        int pos = head[gi] + cnt[gi]++;
        while (pos > head[gi] && t->longSyms[pos - 1].len < L) {
            t->longSyms[pos] = t->longSyms[pos - 1];
            pos--;
        }
        t->longSyms[pos].val = v;
        t->longSyms[pos].mask = ~0ULL << ((8 - L) * 8);
        t->longSyms[pos].len = (uint8_t)L;
        t->longSyms[pos].code = (uint8_t)i;
        p += L;
    }
    memset(t->hkey, 0, sizeof(t->hkey));
    for (int k = 0; k < ngroups; k++) {
        uint32_t h = hash3((uint32_t)gkey[k]);
        while (t->hkey[h]) h = (h + 1) & (HSLOTS - 1);
        t->hkey[h] = (uint32_t)gkey[k] + 1;
        t->hstart[h] = (uint16_t)head[k];
        t->shortCodes[gkey[k] >> 8] |= SC_LONG;
    }
}

/* probe the len>=3 bucket for the exact 3-byte input prefix; returns the
 * sentinel-terminated run, or NULL when absent */
static inline const Sym *probe3(const Table *t, uint32_t key3) {
    uint32_t h = hash3(key3);
    uint32_t want = key3 + 1;
    while (t->hkey[h]) {
        if (t->hkey[h] == want) return &t->longSyms[t->hstart[h]];
        h = (h + 1) & (HSLOTS - 1);
    }
    return 0;
}

static inline uint64_t load_be(const uint8_t *p) {
    uint64_t w;
    memcpy(&w, p, 8);
#if defined(__GNUC__)
    return __builtin_bswap64(w);
#else
    return ((w & 0xffULL) << 56) | ((w & 0xff00ULL) << 40) |
           ((w & 0xff0000ULL) << 24) | ((w & 0xff000000ULL) << 8) |
           ((w >> 8) & 0xff000000ULL) | ((w >> 24) & 0xff0000ULL) |
           ((w >> 40) & 0xff00ULL) | (w >> 56);
#endif
}

/* buf MUST be padded with >=8 readable bytes past the last string */
int64_t fsst_encode_batch(
    const uint8_t *sym_bytes, const uint8_t *sym_lens, int nsym,
    const uint8_t *buf, const int64_t *str_off, int64_t nstr,
    uint8_t *out, int64_t out_cap, int64_t *out_off) {
    static Table t; /* 0.75 MB: off the stack; cffi calls are serialized
                       per process (GIL held around the call) */
    build_table(sym_bytes, sym_lens, nsym, &t);
    int64_t o = 0;
    out_off[0] = 0;
    for (int64_t s = 0; s < nstr; s++) {
        int64_t i = str_off[s], end = str_off[s + 1];
        if (o + 2 * (end - i) > out_cap) return -1;
        while (i < end) {
            int64_t rem = end - i;
            uint32_t sc;
            if (rem >= 2) {
                uint32_t g = ((uint32_t)buf[i] << 8) | buf[i + 1];
                sc = t.shortCodes[g];
                if ((sc & SC_LONG) && rem >= 3) {
                    uint32_t key3 = (g << 8) | buf[i + 2];
                    const Sym *sy = probe3(&t, key3);
                    if (sy) {
                        uint64_t w = load_be(buf + i);
                        int hit = 0;
                        for (; sy->len; sy++) {
                            if (sy->len <= rem &&
                                ((w ^ sy->val) & sy->mask) == 0) {
                                out[o++] = sy->code;
                                i += sy->len;
                                hit = 1;
                                break;
                            }
                        }
                        if (hit) continue;
                    }
                }
            } else {
                sc = t.byte1[buf[i]];
            }
            /* branchless emit: write (code, literal) unconditionally,
             * bump output by 1 + escape-bit, input by the packed advance.
             * The extra byte is in-bounds: the per-string capacity check
             * guarantees >= 2 output bytes per remaining input byte. */
            out[o] = (uint8_t)sc;
            out[o + 1] = buf[i];
            o += 1 + ((sc >> 14) & 1u);
            i += SC_ADV(sc);
        }
        out_off[s + 1] = o;
    }
    return o;
}

/* greedy tokenization for TRAINING: emit symbol index (0..nsym-1) per
 * match, 256+byte for escaped literals, -1 between strings (so pair
 * counting never crosses a string boundary). buf padded by >=8 bytes. */
int64_t fsst_parse_tokens(
    const uint8_t *sym_bytes, const uint8_t *sym_lens, int nsym,
    const uint8_t *buf, const int64_t *str_off, int64_t nstr,
    int16_t *toks, int64_t cap) {
    static Table t;
    build_table(sym_bytes, sym_lens, nsym, &t);
    int64_t o = 0;
    for (int64_t s = 0; s < nstr; s++) {
        int64_t i = str_off[s], end = str_off[s + 1];
        if (o + (end - i) + 1 > cap) return -1;
        if (s) toks[o++] = -1;
        while (i < end) {
            int64_t rem = end - i;
            uint32_t sc;
            if (rem >= 2) {
                uint32_t g = ((uint32_t)buf[i] << 8) | buf[i + 1];
                sc = t.shortCodes[g];
                if ((sc & SC_LONG) && rem >= 3) {
                    uint32_t key3 = (g << 8) | buf[i + 2];
                    const Sym *sy = probe3(&t, key3);
                    if (sy) {
                        uint64_t w = load_be(buf + i);
                        int hit = 0;
                        for (; sy->len; sy++) {
                            if (sy->len <= rem &&
                                ((w ^ sy->val) & sy->mask) == 0) {
                                toks[o++] = sy->code;
                                i += sy->len;
                                hit = 1;
                                break;
                            }
                        }
                        if (hit) continue;
                    }
                }
            } else {
                sc = t.byte1[buf[i]];
            }
            if (sc & SC_ESC) {
                toks[o++] = (int16_t)(256 + buf[i]);
                i++;
            } else {
                toks[o++] = (int16_t)(sc & 0xFFu);
                i += SC_ADV(sc);
            }
        }
    }
    return o;
}

int64_t fsst_decode_batch(
    const uint8_t *sym_bytes, const uint8_t *sym_lens, int nsym,
    const uint8_t *buf, const int64_t *str_off, int64_t nstr,
    uint8_t *out, int64_t out_cap, int64_t *out_off) {
    /* decode table: contiguous bytes + offsets */
    const uint8_t *starts[MAX_SYMS];
    const uint8_t *p = sym_bytes;
    for (int i = 0; i < nsym; i++) {
        starts[i] = p;
        p += sym_lens[i];
    }
    int64_t o = 0;
    out_off[0] = 0;
    for (int64_t s = 0; s < nstr; s++) {
        int64_t i = str_off[s], end = str_off[s + 1];
        while (i < end) {
            uint8_t c = buf[i];
            if (c == ESCAPE) {
                if (o + 1 > out_cap) return -1;
                out[o++] = buf[i + 1];
                i += 2;
            } else {
                /* corrupt payload guard: a code beyond the table would read
                   past sym_lens/starts (garbage length, wild memcpy) — fail
                   cleanly so the caller falls back to the checked path */
                if (c >= nsym) return -1;
                int L = sym_lens[c];
                if (o + 8 > out_cap) return -1; /* fixed 8-byte copy below */
                memcpy(out + o, starts[c], 8); /* padded table, L<=8 */
                o += L;
                i += 1;
            }
        }
        out_off[s + 1] = o;
    }
    return o;
}
"""

lib = None
ffi = None


def _build():
    """Compile (or load the cached) shared object. Returns (ffi, lib) or
    raises."""
    from cffi import FFI

    tag = hashlib.sha256((_CDEF + _SOURCE).encode()).hexdigest()[:16]
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "btrblocks_spark",
    )
    os.makedirs(cache, exist_ok=True)
    modname = f"_btr_fsst_{tag}"

    def _load_from(path: str):
        # explicit-path import: prepending the (user-writable) cache dir to
        # sys.path would make it the highest-priority import location for
        # the whole process — any file dropped there could shadow stdlib or
        # site-packages for every later import (module-shadowing hazard)
        import importlib.util

        spec = importlib.util.spec_from_file_location(modname, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.ffi, mod.lib

    import glob

    existing = sorted(glob.glob(os.path.join(cache, f"{modname}*.so")))
    if existing:
        return _load_from(existing[0])

    f = FFI()
    f.cdef(_CDEF)
    f.set_source(modname, _SOURCE, extra_compile_args=["-O3"])
    with tempfile.TemporaryDirectory(dir=cache) as tmp:
        so = f.compile(tmpdir=tmp)
        dest = os.path.join(cache, os.path.basename(so))
        # atomic publish — concurrent Spark python workers may race here
        tmp_dest = dest + f".{os.getpid()}"
        os.replace(so, tmp_dest)
        os.replace(tmp_dest, dest)
    return _load_from(dest)


try:
    ffi, lib = _build()
except Exception:  # noqa: BLE001 — any failure means "no fast path"
    ffi, lib = None, None
