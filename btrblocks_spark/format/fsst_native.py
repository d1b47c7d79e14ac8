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

/* multi-byte candidates grouped by their FIRST TWO bytes (groups stay
 * tiny even when many symbols share a first byte), sorted by length desc
 * so the first hit IS the greedy longest match; 1-byte symbols live in a
 * direct 256-entry lookup probed after the multi-byte groups miss. */
typedef struct {
    Sym syms[MAX_SYMS];
    int32_t head[65536];  /* start index per first-2-byte key, -1 = none */
    int16_t cnt[65536];
    int16_t code1[256];   /* 1-byte symbol code, -1 = none */
} Table;

static void build_table(const uint8_t *sym_bytes, const uint8_t *sym_lens,
                        int nsym, Table *t) {
    static const int NB = 65536;
    memset(t->cnt, 0, sizeof(t->cnt));
    for (int b = 0; b < 256; b++) t->code1[b] = -1;
    const uint8_t *p = sym_bytes;
    for (int i = 0; i < nsym; i++) {
        if (sym_lens[i] >= 2) t->cnt[(p[0] << 8) | p[1]]++;
        p += sym_lens[i];
    }
    int32_t off = 0;
    for (int b = 0; b < NB; b++) {
        t->head[b] = t->cnt[b] ? off : -1;
        off += t->cnt[b];
    }
    int32_t fill[65536];
    memcpy(fill, t->head, sizeof(fill));
    p = sym_bytes;
    for (int i = 0; i < nsym; i++) {
        int L = sym_lens[i];
        if (L == 1) {
            t->code1[p[0]] = (int16_t)i;
            p += L;
            continue;
        }
        uint64_t v = 0;
        for (int j = 0; j < L; j++) v = (v << 8) | p[j];
        v <<= (8 - L) * 8; /* left-align */
        /* insertion sort by len desc within the group (groups are tiny;
         * equal-length same-prefix symbols are distinct byte strings, at
         * most one can match) */
        int b = (p[0] << 8) | p[1];
        int32_t pos = fill[b]++;
        while (pos > t->head[b] && t->syms[pos - 1].len < L) {
            t->syms[pos] = t->syms[pos - 1];
            pos--;
        }
        t->syms[pos].val = v;
        t->syms[pos].mask = ~0ULL << ((8 - L) * 8);
        t->syms[pos].len = (uint8_t)L;
        t->syms[pos].code = (uint8_t)i;
        p += L;
    }
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
    Table t;
    build_table(sym_bytes, sym_lens, nsym, &t);
    int64_t o = 0;
    out_off[0] = 0;
    for (int64_t s = 0; s < nstr; s++) {
        int64_t i = str_off[s], end = str_off[s + 1];
        if (o + 2 * (end - i) > out_cap) return -1;
        while (i < end) {
            uint8_t b = buf[i];
            int64_t rem = end - i;
            int matched = 0;
            if (rem >= 2) {
                int g = (b << 8) | buf[i + 1];
                int32_t h = t.head[g];
                if (h >= 0) {
                    int16_t c = t.cnt[g];
                    uint64_t w = load_be(buf + i);
                    for (int32_t k = h; k < h + c; k++) {
                        const Sym *sy = &t.syms[k];
                        if (sy->len <= rem && ((w ^ sy->val) & sy->mask) == 0) {
                            out[o++] = sy->code;
                            i += sy->len;
                            matched = 1;
                            break;
                        }
                    }
                }
            }
            if (!matched && t.code1[b] >= 0) {
                out[o++] = (uint8_t)t.code1[b];
                i++;
                matched = 1;
            }
            if (!matched) {
                out[o++] = ESCAPE;
                out[o++] = b;
                i++;
            }
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
    Table t;
    build_table(sym_bytes, sym_lens, nsym, &t);
    int64_t o = 0;
    for (int64_t s = 0; s < nstr; s++) {
        int64_t i = str_off[s], end = str_off[s + 1];
        if (o + (end - i) + 1 > cap) return -1;
        if (s) toks[o++] = -1;
        while (i < end) {
            uint8_t b = buf[i];
            int64_t rem = end - i;
            int matched = 0;
            if (rem >= 2) {
                int g = (b << 8) | buf[i + 1];
                int32_t h = t.head[g];
                if (h >= 0) {
                    int16_t c = t.cnt[g];
                    uint64_t w = load_be(buf + i);
                    for (int32_t k = h; k < h + c; k++) {
                        const Sym *sy = &t.syms[k];
                        if (sy->len <= rem && ((w ^ sy->val) & sy->mask) == 0) {
                            toks[o++] = sy->code;
                            i += sy->len;
                            matched = 1;
                            break;
                        }
                    }
                }
            }
            if (!matched && t.code1[b] >= 0) {
                toks[o++] = t.code1[b];
                i++;
                matched = 1;
            }
            if (!matched) {
                toks[o++] = (int16_t)(256 + b);
                i++;
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
