// hostcodec: native host-side codecs for the arrow_tpu engine.
//
// The reference implements its entire hot path in native code; in this
// engine the device hot path is XLA/Pallas, and THIS library covers the
// host-side loops that sit on the ingest/egress boundary where Python is
// 100-1000x too slow:
//   - validity bitmap pack/unpack (Arrow bitmap <-> dense bool mask)
//   - Avro zigzag-varint block decode (arrow-avro reader/vlq.rs role)
//   - order-preserving row encoding (arrow-row fixed.rs: tag byte +
//     big-endian key) and memcmp row argsort (Row::cmp, lib.rs:1166)
//
// C ABI, loaded via ctypes (no pybind11 in this image).  Build: make -C
// native.  All functions are pure (caller owns buffers).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>

extern "C" {

// ---- validity bitmaps -------------------------------------------------------

// dense bool (1 byte/elem) -> LSB-first packed bits (Arrow validity layout)
void pack_bits(const uint8_t* mask, int64_t n, uint8_t* out) {
    std::memset(out, 0, (n + 7) / 8);
    for (int64_t i = 0; i < n; ++i) {
        out[i >> 3] |= static_cast<uint8_t>(mask[i] != 0) << (i & 7);
    }
}

void unpack_bits(const uint8_t* bits, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        out[i] = (bits[i >> 3] >> (i & 7)) & 1;
    }
}

int64_t count_set_bits(const uint8_t* bits, int64_t n) {
    int64_t cnt = 0;
    int64_t i = 0;
    for (; i + 64 <= n; i += 64) {
        uint64_t w;
        std::memcpy(&w, bits + (i >> 3), 8);
        cnt += __builtin_popcountll(w);
    }
    for (; i < n; ++i) cnt += (bits[i >> 3] >> (i & 7)) & 1;
    return cnt;
}

// ---- avro vlq/zigzag block decode -------------------------------------------

// Decode `count` zigzag varints starting at data[pos]; returns new pos or
// -1 on truncation.  (arrow-avro reader/vlq.rs, decode-only.)
int64_t decode_zigzag_longs(const uint8_t* data, int64_t len, int64_t pos,
                            int64_t count, int64_t* out) {
    for (int64_t k = 0; k < count; ++k) {
        uint64_t acc = 0;
        int shift = 0;
        while (true) {
            if (pos >= len) return -1;
            uint8_t b = data[pos++];
            acc |= static_cast<uint64_t>(b & 0x7F) << shift;
            if (!(b & 0x80)) break;
            shift += 7;
            if (shift > 63) return -1;
        }
        out[k] = static_cast<int64_t>(acc >> 1) ^ -static_cast<int64_t>(acc & 1);
    }
    return pos;
}

// ---- order-preserving row encoding (arrow-row fixed.rs) ----------------------

// keys: column-major (ncols arrays of n uint64 value keys, pre-transformed
// order-preserving); valid: ncols arrays of n bools (nullptr = all valid).
// Emits rows of ncols * 9 bytes: [tag][8B big-endian key] per column.
// tag: 0x01 valid; null tag 0x00 (nulls first) or 0xFF (nulls last).
// desc: invert key bytes (descending).
void encode_rows(const uint64_t* const* keys, const uint8_t* const* valid,
                 const uint8_t* desc, const uint8_t* nulls_first,
                 int64_t n, int32_t ncols, uint8_t* out) {
    const int64_t width = static_cast<int64_t>(ncols) * 9;
    for (int64_t i = 0; i < n; ++i) {
        uint8_t* row = out + i * width;
        for (int32_t c = 0; c < ncols; ++c) {
            uint8_t* cell = row + c * 9;
            bool ok = valid[c] == nullptr || valid[c][i];
            uint64_t k = ok ? keys[c][i] : 0;
            if (desc[c]) k = ~k;
            cell[0] = ok ? 0x01 : (nulls_first[c] ? 0x00 : 0xFF);
            for (int b = 0; b < 8; ++b) {
                cell[1 + b] = static_cast<uint8_t>(k >> (56 - 8 * b));
            }
        }
    }
}

// Stable argsort of fixed-width rows by memcmp (Row: Ord, lib.rs:1166).
void argsort_rows(const uint8_t* rows, int64_t n, int64_t width,
                  uint32_t* out) {
    std::iota(out, out + n, 0u);
    std::stable_sort(out, out + n, [&](uint32_t a, uint32_t b) {
        return std::memcmp(rows + static_cast<int64_t>(a) * width,
                           rows + static_cast<int64_t>(b) * width,
                           width) < 0;
    });
}

// ---- variable-length row encoding (arrow-row variable.rs:28-100) -------------
//
// Non-empty values encode as 0x02 followed by 32-byte data blocks, each
// block terminated by a token byte: 0xFF for full (continued) blocks, and
// data_len_in_block + 1 for the (zero-padded) final block.  Empty value:
// 0x01.  Null: 0x00 (nulls first) / 0xFF (nulls last).  Descending
// inverts every byte.  Each slot is padded to a fixed width of
// 1 + 33 * nblocks bytes so rows stay a memcmp-comparable matrix.

static inline uint8_t flip(uint8_t b, bool desc) {
    return desc ? static_cast<uint8_t>(~b) : b;
}

void encode_varlen_rows(const int32_t* offsets, const uint8_t* data,
                        const uint8_t* valid, int64_t n, int32_t nblocks,
                        uint8_t desc, uint8_t nulls_first, uint8_t* out) {
    const int64_t width = 1 + 33LL * nblocks;
    const bool d = desc != 0;
    for (int64_t i = 0; i < n; ++i) {
        uint8_t* cell = out + i * width;
        std::memset(cell, d ? 0xFF : 0x00, width);
        bool ok = valid == nullptr || valid[i];
        if (!ok) {
            cell[0] = nulls_first ? 0x00 : 0xFF;  // null tag is not inverted
            continue;
        }
        int64_t start = offsets[i], end = offsets[i + 1];
        int64_t len = end - start;
        if (len == 0) {
            cell[0] = flip(0x01, d);
            continue;
        }
        cell[0] = flip(0x02, d);
        uint8_t* p = cell + 1;
        int64_t done = 0;
        while (done < len) {
            int64_t chunk = std::min<int64_t>(32, len - done);
            for (int64_t b = 0; b < chunk; ++b) {
                p[b] = flip(data[start + done + b], d);
            }
            for (int64_t b = chunk; b < 32; ++b) p[b] = flip(0x00, d);
            bool last = done + chunk >= len;
            p[32] = flip(last ? static_cast<uint8_t>(chunk + 1) : 0xFF, d);
            p += 33;
            done += chunk;
        }
    }
}

// Inverse: recover (offsets, bytes, validity) from fixed-width slots.
// out_data must hold 32 * nblocks * n bytes.  Returns total data bytes.
int64_t decode_varlen_rows(const uint8_t* rows, int64_t n, int64_t stride,
                           int64_t cell_offset, int32_t nblocks,
                           uint8_t desc, uint8_t nulls_first,
                           int32_t* out_offsets, uint8_t* out_data,
                           uint8_t* out_valid) {
    const bool d = desc != 0;
    int64_t pos = 0;
    out_offsets[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* cell = rows + i * stride + cell_offset;
        uint8_t tag = cell[0];
        uint8_t null_tag = nulls_first ? 0x00 : 0xFF;
        if (tag == null_tag) {
            out_valid[i] = 0;
            out_offsets[i + 1] = static_cast<int32_t>(pos);
            continue;
        }
        out_valid[i] = 1;
        if (flip(tag, d) == 0x01) {               // empty
            out_offsets[i + 1] = static_cast<int32_t>(pos);
            continue;
        }
        const uint8_t* p = cell + 1;
        for (int32_t blk = 0; blk < nblocks; ++blk) {
            uint8_t token = flip(p[32], d);
            int64_t chunk = (token == 0xFF) ? 32 : token - 1;
            for (int64_t b = 0; b < chunk; ++b) {
                out_data[pos + b] = flip(p[b], d);
            }
            pos += chunk;
            if (token != 0xFF) break;
            p += 33;
        }
        out_offsets[i + 1] = static_cast<int32_t>(pos);
    }
    return pos;
}

// ---- selection host fallbacks ------------------------------------------------

// Gather of 8-byte elements (host-side take for spill/io paths).
void gather64(const uint64_t* src, const int64_t* idx, int64_t n,
              uint64_t* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = src[idx[i]];
}

// Filter-compact 8-byte elements; returns kept count.
int64_t compact64(const uint64_t* src, const uint8_t* keep, int64_t n,
                  uint64_t* out) {
    int64_t k = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (keep[i]) out[k++] = src[i];
    }
    return k;
}

// ---- xxHash64 (parquet bloom filters use seed 0) -----------------------------
// Spec: https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md

static const uint64_t XXP1 = 11400714785074694791ULL;
static const uint64_t XXP2 = 14029467366897019727ULL;
static const uint64_t XXP3 = 1609587929392839161ULL;
static const uint64_t XXP4 = 9650029242287828579ULL;
static const uint64_t XXP5 = 2870177450012600261ULL;

static inline uint64_t xx_rotl(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}

static inline uint64_t xx_round(uint64_t acc, uint64_t input) {
    acc += input * XXP2;
    acc = xx_rotl(acc, 31);
    return acc * XXP1;
}

static inline uint64_t xx_merge(uint64_t acc, uint64_t val) {
    acc ^= xx_round(0, val);
    return acc * XXP1 + XXP4;
}

static inline uint64_t xx_read64(const uint8_t* p) {
    uint64_t v;
    __builtin_memcpy(&v, p, 8);
    return v;
}

static inline uint32_t xx_read32(const uint8_t* p) {
    uint32_t v;
    __builtin_memcpy(&v, p, 4);
    return v;
}

uint64_t xxhash64(const uint8_t* data, int64_t len, uint64_t seed) {
    const uint8_t* p = data;
    const uint8_t* end = data + len;
    uint64_t h;
    if (len >= 32) {
        uint64_t v1 = seed + XXP1 + XXP2, v2 = seed + XXP2;
        uint64_t v3 = seed, v4 = seed - XXP1;
        do {
            v1 = xx_round(v1, xx_read64(p)); p += 8;
            v2 = xx_round(v2, xx_read64(p)); p += 8;
            v3 = xx_round(v3, xx_read64(p)); p += 8;
            v4 = xx_round(v4, xx_read64(p)); p += 8;
        } while (p + 32 <= end);
        h = xx_rotl(v1, 1) + xx_rotl(v2, 7) + xx_rotl(v3, 12)
            + xx_rotl(v4, 18);
        h = xx_merge(h, v1); h = xx_merge(h, v2);
        h = xx_merge(h, v3); h = xx_merge(h, v4);
    } else {
        h = seed + XXP5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        h ^= xx_round(0, xx_read64(p));
        h = xx_rotl(h, 27) * XXP1 + XXP4;
        p += 8;
    }
    if (p + 4 <= end) {
        h ^= (uint64_t)xx_read32(p) * XXP1;
        h = xx_rotl(h, 23) * XXP2 + XXP3;
        p += 4;
    }
    while (p < end) {
        h ^= (uint64_t)(*p) * XXP5;
        h = xx_rotl(h, 11) * XXP1;
        ++p;
    }
    h ^= h >> 33;
    h *= XXP2;
    h ^= h >> 29;
    h *= XXP3;
    h ^= h >> 32;
    return h;
}

// Hash n fixed-width elements (parquet plain encoding = raw LE bytes).
void xxhash64_fixed(const uint8_t* data, int64_t n, int64_t width,
                    uint64_t seed, uint64_t* out) {
    for (int64_t i = 0; i < n; ++i)
        out[i] = xxhash64(data + i * width, width, seed);
}

// Hash n variable-length byte strings given int32 offsets.
void xxhash64_varlen(const int32_t* offsets, const uint8_t* data,
                     int64_t n, uint64_t seed, uint64_t* out) {
    for (int64_t i = 0; i < n; ++i)
        out[i] = xxhash64(data + offsets[i],
                          offsets[i + 1] - offsets[i], seed);
}

// ---- split-block bloom filter (parquet SBBF) ---------------------------------

static const uint32_t SBBF_SALT[8] = {
    0x47b6137bU, 0x44974d91U, 0x8824ad5bU, 0xa2b7289dU,
    0x705495c7U, 0x2df1424bU, 0x9efc4947U, 0x5c6bfb31U};

static inline uint32_t* sbbf_block(uint8_t* bitset, int64_t num_blocks,
                                   uint64_t hash) {
    uint64_t idx = (((hash >> 32) * (uint64_t)num_blocks) >> 32);
    return (uint32_t*)(bitset + idx * 32);
}

void sbbf_insert(uint8_t* bitset, int64_t num_blocks,
                 const uint64_t* hashes, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        uint32_t* b = sbbf_block(bitset, num_blocks, hashes[i]);
        uint32_t key = (uint32_t)hashes[i];
        for (int j = 0; j < 8; ++j)
            b[j] |= 1U << ((key * SBBF_SALT[j]) >> 27);
    }
}

void sbbf_check(const uint8_t* bitset, int64_t num_blocks,
                const uint64_t* hashes, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const uint32_t* b = sbbf_block((uint8_t*)bitset, num_blocks,
                                       hashes[i]);
        uint32_t key = (uint32_t)hashes[i];
        uint8_t hit = 1;
        for (int j = 0; j < 8; ++j)
            hit &= (b[j] >> ((key * SBBF_SALT[j]) >> 27)) & 1U;
        out[i] = hit;
    }
}

}  // extern "C"
