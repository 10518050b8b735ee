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

// ---- xxHash32 (LZ4 frame header/content checksums) --------------------------

static const uint32_t XXH32_P1 = 2654435761U, XXH32_P2 = 2246822519U,
                      XXH32_P3 = 3266489917U, XXH32_P4 = 668265263U,
                      XXH32_P5 = 374761393U;

static inline uint32_t xxh_rotl32(uint32_t x, int r) {
    return (x << r) | (x >> (32 - r));
}

static inline uint32_t xxh32_round(uint32_t acc, uint32_t input) {
    acc += input * XXH32_P2;
    acc = xxh_rotl32(acc, 13);
    acc *= XXH32_P1;
    return acc;
}

uint32_t xxhash32(const uint8_t* data, int64_t len, uint32_t seed) {
    const uint8_t* p = data;
    const uint8_t* end = data + len;
    uint32_t h;
    if (len >= 16) {
        uint32_t v1 = seed + XXH32_P1 + XXH32_P2;
        uint32_t v2 = seed + XXH32_P2;
        uint32_t v3 = seed;
        uint32_t v4 = seed - XXH32_P1;
        while (p + 16 <= end) {
            uint32_t a, b, c, d;
            std::memcpy(&a, p, 4); std::memcpy(&b, p + 4, 4);
            std::memcpy(&c, p + 8, 4); std::memcpy(&d, p + 12, 4);
            v1 = xxh32_round(v1, a); v2 = xxh32_round(v2, b);
            v3 = xxh32_round(v3, c); v4 = xxh32_round(v4, d);
            p += 16;
        }
        h = xxh_rotl32(v1, 1) + xxh_rotl32(v2, 7) + xxh_rotl32(v3, 12)
            + xxh_rotl32(v4, 18);
    } else {
        h = seed + XXH32_P5;
    }
    h += (uint32_t)len;
    while (p + 4 <= end) {
        uint32_t w;
        std::memcpy(&w, p, 4);
        h += w * XXH32_P3;
        h = xxh_rotl32(h, 17) * XXH32_P4;
        p += 4;
    }
    while (p < end) {
        h += (*p) * XXH32_P5;
        h = xxh_rotl32(h, 11) * XXH32_P1;
        ++p;
    }
    h ^= h >> 15; h *= XXH32_P2;
    h ^= h >> 13; h *= XXH32_P3;
    h ^= h >> 16;
    return h;
}

// ---- LZ4 block + frame codec ------------------------------------------------
//
// Arrow IPC buffer compression (Message.fbs CompressionType::LZ4_FRAME,
// arrow-ipc/src/compression.rs:27) uses the LZ4 *frame* format with each
// buffer as a single frame.  No lz4 library is baked into this image, so
// the block codec is implemented from the public spec: sequences of
// [token | literal-run | 2-byte offset | match-run].

static inline uint32_t lz4_read32(const uint8_t* p) {
    uint32_t v; std::memcpy(&v, p, 4); return v;
}

static inline uint32_t lz4_hash4(uint32_t v) {
    return (v * 2654435761U) >> 16;   // 16-bit hash table
}

// Greedy single-pass compressor.  Returns compressed size, or -1 if
// output would exceed cap (caller then stores the block raw).
int64_t lz4_block_compress(const uint8_t* src, int64_t n,
                           uint8_t* dst, int64_t cap) {
    int32_t table[65536];
    std::fill(table, table + 65536, -1);
    int64_t ip = 0, op = 0, anchor = 0;
    const int64_t mflimit = n - 12;    // spec: last match >= 12 from end

    auto emit_run = [&](int64_t lit_len, int64_t match_len,
                        int64_t offset) -> bool {
        int64_t tok_pos = op++;
        if (op > cap) return false;
        uint8_t token = 0;
        if (lit_len >= 15) {
            token |= 0xF0;
            int64_t rem = lit_len - 15;
            while (rem >= 255) {
                if (op >= cap) return false;
                dst[op++] = 255; rem -= 255;
            }
            if (op >= cap) return false;
            dst[op++] = (uint8_t)rem;
        } else {
            token |= (uint8_t)(lit_len << 4);
        }
        if (op + lit_len > cap) return false;
        std::memcpy(dst + op, src + anchor, lit_len);
        op += lit_len;
        if (match_len >= 0) {          // -1 = final literals-only run
            if (op + 2 > cap) return false;
            dst[op++] = (uint8_t)(offset & 0xFF);
            dst[op++] = (uint8_t)(offset >> 8);
            int64_t ml = match_len - 4;
            if (ml >= 15) {
                token |= 0x0F;
                ml -= 15;
                while (ml >= 255) {
                    if (op >= cap) return false;
                    dst[op++] = 255; ml -= 255;
                }
                if (op >= cap) return false;
                dst[op++] = (uint8_t)ml;
            } else {
                token |= (uint8_t)ml;
            }
        }
        dst[tok_pos] = token;
        return true;
    };

    while (ip < mflimit) {
        uint32_t h = lz4_hash4(lz4_read32(src + ip));
        int64_t cand = table[h];
        table[h] = (int32_t)ip;
        if (cand >= 0 && ip - cand <= 65535 &&
            lz4_read32(src + cand) == lz4_read32(src + ip)) {
            // extend match forward (stop 5 bytes short of the end)
            int64_t m = 4;
            int64_t limit = n - 5 - ip;
            while (m < limit && src[cand + m] == src[ip + m]) ++m;
            if (!emit_run(ip - anchor, m, ip - cand)) return -1;
            ip += m;
            anchor = ip;
        } else {
            ++ip;
        }
    }
    if (!emit_run(n - anchor, -1, 0)) return -1;
    return op;
}

// Returns decompressed size, or -1 on malformed input / overflow.
int64_t lz4_block_decompress(const uint8_t* src, int64_t n,
                             uint8_t* dst, int64_t cap) {
    int64_t ip = 0, op = 0;
    while (ip < n) {
        uint8_t token = src[ip++];
        int64_t lit = token >> 4;
        if (lit == 15) {
            uint8_t b;
            do {
                if (ip >= n) return -1;
                b = src[ip++]; lit += b;
            } while (b == 255);
        }
        if (ip + lit > n || op + lit > cap) return -1;
        std::memcpy(dst + op, src + ip, lit);
        ip += lit; op += lit;
        if (ip >= n) break;            // final literals-only sequence
        if (ip + 2 > n) return -1;
        int64_t offset = src[ip] | ((int64_t)src[ip + 1] << 8);
        ip += 2;
        if (offset == 0 || offset > op) return -1;
        int64_t ml = (token & 0x0F) + 4;
        if ((token & 0x0F) == 15) {
            uint8_t b;
            do {
                if (ip >= n) return -1;
                b = src[ip++]; ml += b;
            } while (b == 255);
        }
        if (op + ml > cap) return -1;
        // overlapping copy must run byte-forward
        const uint8_t* from = dst + op - offset;
        for (int64_t i = 0; i < ml; ++i) dst[op + i] = from[i];
        op += ml;
    }
    return op;
}

// LZ4 frame compress: independent 4 MB blocks, no checksums (matching
// lz4frame defaults as used by Arrow C++/Rust writers).  Returns frame
// size or -1 if dst cap exceeded.
int64_t lz4_frame_compress(const uint8_t* src, int64_t n,
                           uint8_t* dst, int64_t cap) {
    static const int64_t BLOCK = 4 * 1024 * 1024;
    int64_t op = 0;
    if (op + 7 > cap) return -1;
    dst[op++] = 0x04; dst[op++] = 0x22; dst[op++] = 0x4D; dst[op++] = 0x18;
    int64_t flg_pos = op;
    dst[op++] = 0x60;                  // version 01, block independence
    dst[op++] = 0x70;                  // BD: 4 MB max block size
    dst[op++] = (uint8_t)(xxhash32(dst + flg_pos, 2, 0) >> 8);
    for (int64_t pos = 0; pos < n; pos += BLOCK) {
        int64_t len = std::min(BLOCK, n - pos);
        if (op + 4 > cap) return -1;
        int64_t csize = lz4_block_compress(src + pos, len, dst + op + 4,
                                           std::min(cap - op - 4,
                                                    len - 1));
        uint32_t hdr;
        if (csize < 0) {               // incompressible: store raw
            if (op + 4 + len > cap) return -1;
            hdr = (uint32_t)len | 0x80000000U;
            std::memcpy(dst + op, &hdr, 4);
            std::memcpy(dst + op + 4, src + pos, len);
            op += 4 + len;
        } else {
            hdr = (uint32_t)csize;
            std::memcpy(dst + op, &hdr, 4);
            op += 4 + csize;
        }
    }
    if (op + 4 > cap) return -1;
    std::memset(dst + op, 0, 4);       // end mark
    op += 4;
    return op;
}

// LZ4 frame decompress into a caller-sized buffer (Arrow's compression
// framing carries the uncompressed length).  Handles optional content
// size, block checksums, content checksum, and dict-id header fields.
// Returns decompressed size or -1 on malformed input.
int64_t lz4_frame_decompress(const uint8_t* src, int64_t n,
                             uint8_t* dst, int64_t cap) {
    if (n < 7) return -1;
    if (!(src[0] == 0x04 && src[1] == 0x22 && src[2] == 0x4D &&
          src[3] == 0x18)) return -1;
    int64_t ip = 4;
    uint8_t flg = src[ip++];
    ip++;                              // BD byte
    bool b_checksum = flg & 0x10;
    bool c_size = flg & 0x08;
    bool c_checksum = flg & 0x04;
    bool dict_id = flg & 0x01;
    if (c_size) ip += 8;
    if (dict_id) ip += 4;
    ip += 1;                           // HC byte
    int64_t op = 0;
    while (true) {
        if (ip + 4 > n) return -1;
        uint32_t hdr = lz4_read32(src + ip);
        ip += 4;
        if (hdr == 0) break;           // end mark
        bool raw = hdr & 0x80000000U;
        int64_t len = hdr & 0x7FFFFFFF;
        if (ip + len > n) return -1;
        if (raw) {
            if (op + len > cap) return -1;
            std::memcpy(dst + op, src + ip, len);
            op += len;
        } else {
            int64_t d = lz4_block_decompress(src + ip, len, dst + op,
                                             cap - op);
            if (d < 0) return -1;
            op += d;
        }
        ip += len;
        if (b_checksum) ip += 4;
    }
    (void)c_checksum;                  // trailing checksum: not verified
    return op;
}

// ---- Parquet page decoders --------------------------------------------------
//
// The byte-crunching half of the native Parquet read path
// (parquet/src/encodings/decoding.rs, encodings/rle.rs re-designed):
// RLE/bit-packed hybrid levels + dictionary indices, DELTA_BINARY_PACKED,
// DELTA_BYTE_ARRAY reconstruction, PLAIN byte-array splitting, and the
// snappy codec.  Python (io/parquet_native.py) orchestrates; these loops
// run at memory speed.

static inline int64_t uvarint(const uint8_t* p, int64_t len, int64_t* pos,
                              uint64_t* out) {
    uint64_t acc = 0;
    int shift = 0;
    while (*pos < len) {
        uint8_t b = p[(*pos)++];
        acc |= (uint64_t)(b & 0x7F) << shift;
        if (!(b & 0x80)) { *out = acc; return 0; }
        shift += 7;
        if (shift > 63) return -1;
    }
    return -1;
}

// RLE/bit-packed hybrid (encodings/rle.rs): runs of
//   varint header: (n << 1) | bitpacked
//   RLE: value in ceil(bw/8) LE bytes, repeated n times
//   bit-packed: n GROUPS of 8 values, bw bits each, LSB first
// Returns bytes consumed, or -1 on malformed input.
int64_t rle_bp_decode(const uint8_t* src, int64_t len, int32_t bit_width,
                      int64_t count, uint32_t* out) {
    int64_t pos = 0, produced = 0;
    if (bit_width == 0) {
        std::memset(out, 0, count * 4);
        return 0;
    }
    const int64_t byte_w = (bit_width + 7) / 8;
    const uint32_t mask = bit_width >= 32 ? 0xFFFFFFFFu
                                          : ((1u << bit_width) - 1);
    while (produced < count) {
        uint64_t hdr;
        if (uvarint(src, len, &pos, &hdr) < 0) return -1;
        if (hdr & 1) {                 // bit-packed groups
            int64_t groups = (int64_t)(hdr >> 1);
            int64_t nvals = groups * 8;
            int64_t nbytes = groups * bit_width;   // = nvals*bw/8
            if (pos + nbytes > len) return -1;
            int64_t take = std::min(nvals, count - produced);
            uint64_t bitpos = 0;
            const uint8_t* base = src + pos;
            for (int64_t i = 0; i < take; ++i) {
                int64_t byte_off = bitpos >> 3;
                int bit_off = bitpos & 7;
                uint64_t w = 0;
                int64_t avail = std::min<int64_t>(8, nbytes - byte_off);
                std::memcpy(&w, base + byte_off, avail);
                out[produced + i] = (uint32_t)(w >> bit_off) & mask;
                bitpos += bit_width;
            }
            produced += take;
            pos += nbytes;
        } else {                       // RLE run
            int64_t n = (int64_t)(hdr >> 1);
            if (pos + byte_w > len) return -1;
            uint32_t v = 0;
            std::memcpy(&v, src + pos, byte_w);
            v &= mask;
            pos += byte_w;
            int64_t take = std::min(n, count - produced);
            for (int64_t i = 0; i < take; ++i) out[produced + i] = v;
            produced += take;
        }
    }
    return pos;
}

// RLE/bit-packed hybrid encoder used by the writer: RLE for runs >= 8,
// else 8-value bit-packed groups.  Returns bytes written or -1.
int64_t rle_bp_encode(const uint32_t* vals, int64_t count,
                      int32_t bit_width, uint8_t* dst, int64_t cap) {
    int64_t pos = 0, i = 0;
    const int64_t byte_w = (bit_width + 7) / 8;
    auto put_varint = [&](uint64_t v) -> bool {
        while (true) {
            if (pos >= cap) return false;
            if (v >= 0x80) { dst[pos++] = (uint8_t)(v | 0x80); v >>= 7; }
            else { dst[pos++] = (uint8_t)v; return true; }
        }
    };
    while (i < count) {
        // measure run of identical values
        int64_t run = 1;
        while (i + run < count && vals[i + run] == vals[i]) ++run;
        if (run >= 8) {
            if (!put_varint((uint64_t)run << 1)) return -1;
            if (pos + byte_w > cap) return -1;
            std::memcpy(dst + pos, &vals[i], byte_w);
            pos += byte_w;
            i += run;
        } else {
            // bit-pack groups of 8 until the next long run (or end)
            int64_t start = i;
            int64_t j = i;
            while (j < count) {
                int64_t r = 1;
                while (j + r < count && vals[j + r] == vals[j]) ++r;
                if (r >= 16) break;    // worth switching to RLE
                j += r;
            }
            int64_t nvals = j - start;
            int64_t groups = (nvals + 7) / 8;
            if (!put_varint(((uint64_t)groups << 1) | 1)) return -1;
            int64_t nbytes = groups * bit_width;
            if (pos + nbytes > cap) return -1;
            std::memset(dst + pos, 0, nbytes);
            uint64_t bitpos = 0;
            for (int64_t k = 0; k < groups * 8; ++k) {
                uint32_t v = (start + k < count) ? vals[start + k] : 0;
                int64_t byte_off = bitpos >> 3;
                int bit_off = bitpos & 7;
                uint64_t w = ((uint64_t)v) << bit_off;
                for (int b = 0; b < 8 && byte_off + b < nbytes; ++b)
                    dst[pos + byte_off + b] |= (uint8_t)(w >> (8 * b));
                bitpos += bit_width;
            }
            pos += nbytes;
            i = j;
        }
    }
    return pos;
}

// PLAIN byte-array: u32-length-prefixed values -> offsets + packed data.
// Returns total data bytes, or -1 on truncation/overflow.
int64_t plain_byte_array_decode(const uint8_t* src, int64_t len,
                                int64_t count, int32_t* offsets,
                                uint8_t* data, int64_t data_cap) {
    int64_t pos = 0, total = 0;
    offsets[0] = 0;
    for (int64_t i = 0; i < count; ++i) {
        if (pos + 4 > len) return -1;
        uint32_t n;
        std::memcpy(&n, src + pos, 4);
        pos += 4;
        if (pos + n > len || total + n > data_cap) return -1;
        std::memcpy(data + total, src + pos, n);
        pos += n;
        total += n;
        offsets[i + 1] = (int32_t)total;
    }
    return total;
}

// DELTA_BINARY_PACKED (encodings/delta_bit_pack.rs role).  Returns bytes
// consumed or -1.
int64_t delta_binary_packed_decode(const uint8_t* src, int64_t len,
                                   int64_t count, int64_t* out) {
    int64_t pos = 0;
    uint64_t block_size, mini_per_block, total, first_zz;
    if (uvarint(src, len, &pos, &block_size) < 0) return -1;
    if (uvarint(src, len, &pos, &mini_per_block) < 0) return -1;
    if (uvarint(src, len, &pos, &total) < 0) return -1;
    if (uvarint(src, len, &pos, &first_zz) < 0) return -1;
    if (mini_per_block == 0 || block_size % mini_per_block) return -1;
    int64_t per_mini = block_size / mini_per_block;
    int64_t value = (int64_t)((first_zz >> 1) ^ -(int64_t)(first_zz & 1));
    int64_t produced = 0;
    if (count > 0) out[produced++] = value;
    while (produced < count) {
        uint64_t min_delta_zz;
        if (uvarint(src, len, &pos, &min_delta_zz) < 0) return -1;
        int64_t min_delta = (int64_t)((min_delta_zz >> 1)
                                      ^ -(int64_t)(min_delta_zz & 1));
        if (pos + (int64_t)mini_per_block > len) return -1;
        const uint8_t* widths = src + pos;
        pos += mini_per_block;
        for (uint64_t m = 0; m < mini_per_block && produced < count; ++m) {
            int bw = widths[m];
            int64_t nbytes = per_mini * bw / 8;
            if (pos + nbytes > len) return -1;
            const uint8_t* base = src + pos;
            uint64_t mask = bw >= 64 ? ~0ull : ((1ull << bw) - 1);
            uint64_t bitpos = 0;
            for (int64_t k = 0; k < per_mini && produced < count; ++k) {
                uint64_t d = 0;
                if (bw) {
                    int64_t byte_off = bitpos >> 3;
                    int bit_off = bitpos & 7;
                    // need up to bw+7 bits: read 8 bytes + spill byte
                    uint64_t w = 0;
                    int64_t avail = std::min<int64_t>(8, nbytes - byte_off);
                    std::memcpy(&w, base + byte_off, avail);
                    d = (w >> bit_off) & mask;
                    if (bit_off + bw > 64 && byte_off + 8 < nbytes) {
                        uint64_t hi = base[byte_off + 8];
                        d |= (hi << (64 - bit_off)) & mask;
                    }
                    bitpos += bw;
                }
                value += min_delta + (int64_t)d;
                out[produced++] = value;
            }
            pos += nbytes;
        }
    }
    return pos;
}

// DELTA_BYTE_ARRAY reconstruction: prefix/suffix lengths already decoded;
// suffix bytes concatenated in `suffixes`.  Writes offsets + data.
// Returns total data bytes or -1.
int64_t delta_byte_array_build(const int64_t* prefix_lens,
                               const int64_t* suffix_lens,
                               const uint8_t* suffixes, int64_t suffix_total,
                               int64_t count, int32_t* offsets,
                               uint8_t* data, int64_t data_cap) {
    int64_t total = 0, spos = 0;
    offsets[0] = 0;
    int64_t prev = 0;      // offset of previous value in `data`
    int64_t prev_len = 0;
    for (int64_t i = 0; i < count; ++i) {
        int64_t pl = prefix_lens[i], sl = suffix_lens[i];
        if (pl > prev_len || spos + sl > suffix_total
            || total + pl + sl > data_cap) return -1;
        std::memcpy(data + total, data + prev, pl);
        std::memcpy(data + total + pl, suffixes + spos, sl);
        spos += sl;
        prev = total;
        prev_len = pl + sl;
        total += prev_len;
        offsets[i + 1] = (int32_t)total;
    }
    return total;
}

// ---- snappy raw codec -------------------------------------------------------
// (format: varint uncompressed length; then literal/copy elements)

int64_t snappy_decompress(const uint8_t* src, int64_t len,
                          uint8_t* dst, int64_t cap) {
    int64_t pos = 0;
    uint64_t ulen;
    if (uvarint(src, len, &pos, &ulen) < 0) return -1;
    if ((int64_t)ulen > cap) return -1;
    int64_t op = 0;
    while (pos < len) {
        uint8_t tag = src[pos++];
        uint32_t kind = tag & 3;
        if (kind == 0) {               // literal
            int64_t n = (tag >> 2) + 1;
            if (n > 60) {
                int extra = (int)n - 60;
                if (pos + extra > len) return -1;
                uint32_t v = 0;
                std::memcpy(&v, src + pos, extra);
                pos += extra;
                n = (int64_t)v + 1;
            }
            if (pos + n > len || op + n > (int64_t)ulen) return -1;
            std::memcpy(dst + op, src + pos, n);
            pos += n;
            op += n;
        } else {
            int64_t n, offset;
            if (kind == 1) {
                if (pos >= len) return -1;
                n = ((tag >> 2) & 7) + 4;
                offset = ((int64_t)(tag >> 5) << 8) | src[pos++];
            } else if (kind == 2) {
                if (pos + 2 > len) return -1;
                n = (tag >> 2) + 1;
                uint16_t o;
                std::memcpy(&o, src + pos, 2);
                pos += 2;
                offset = o;
            } else {
                if (pos + 4 > len) return -1;
                n = (tag >> 2) + 1;
                uint32_t o;
                std::memcpy(&o, src + pos, 4);
                pos += 4;
                offset = o;
            }
            if (offset == 0 || offset > op
                || op + n > (int64_t)ulen) return -1;
            const uint8_t* from = dst + op - offset;
            for (int64_t i = 0; i < n; ++i) dst[op + i] = from[i];
            op += n;
        }
    }
    return op == (int64_t)ulen ? op : -1;
}

// Greedy snappy compressor (64 KB windows).  Returns compressed size;
// never fails given cap >= snappy worst case (n + n/6 + 32).
int64_t snappy_compress(const uint8_t* src, int64_t n,
                        uint8_t* dst, int64_t cap) {
    int64_t pos = 0;
    // header: uncompressed length varint
    {
        uint64_t v = (uint64_t)n;
        while (v >= 0x80) { dst[pos++] = (uint8_t)(v | 0x80); v >>= 7; }
        dst[pos++] = (uint8_t)v;
    }
    auto emit_literal = [&](int64_t start, int64_t count) {
        while (count > 0) {
            int64_t n1 = std::min<int64_t>(count, 1 << 16);
            if (n1 <= 60) {
                dst[pos++] = (uint8_t)((n1 - 1) << 2);
            } else if (n1 <= 256) {
                dst[pos++] = 60 << 2;
                dst[pos++] = (uint8_t)(n1 - 1);
            } else {
                dst[pos++] = 61 << 2;
                uint16_t v = (uint16_t)(n1 - 1);
                std::memcpy(dst + pos, &v, 2);
                pos += 2;
            }
            std::memcpy(dst + pos, src + start, n1);
            pos += n1;
            start += n1;
            count -= n1;
        }
    };
    auto emit_copy = [&](int64_t offset, int64_t len) {
        while (len > 0) {
            int64_t n1 = std::min<int64_t>(len, 64);
            if (n1 >= 4 && n1 <= 11 && offset < 2048) {
                dst[pos++] = (uint8_t)(1 | ((n1 - 4) << 2)
                                       | ((offset >> 8) << 5));
                dst[pos++] = (uint8_t)(offset & 0xFF);
            } else {
                dst[pos++] = (uint8_t)(2 | ((n1 - 1) << 2));
                uint16_t o = (uint16_t)offset;
                std::memcpy(dst + pos, &o, 2);
                pos += 2;
            }
            len -= n1;
        }
    };
    (void)cap;
    int32_t table[16384];
    std::fill(table, table + 16384, -1);
    int64_t ip = 0, anchor = 0;
    const int64_t limit = n - 15;
    while (ip < limit) {
        uint32_t h = (lz4_read32(src + ip) * 0x1e35a7bd) >> 18;
        int64_t cand = table[h];
        table[h] = (int32_t)ip;
        if (cand >= 0 && ip - cand <= 65535 &&
            lz4_read32(src + cand) == lz4_read32(src + ip)) {
            int64_t m = 4;
            while (ip + m < n && src[cand + m] == src[ip + m]) ++m;
            if (ip > anchor) emit_literal(anchor, ip - anchor);
            emit_copy(ip - cand, m);
            ip += m;
            anchor = ip;
        } else {
            ++ip;
        }
    }
    if (anchor < n) emit_literal(anchor, n - anchor);
    return pos;
}

}  // extern "C"
