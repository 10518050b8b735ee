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
#include <charconv>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <numeric>
#include <vector>

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
            const uint8_t* base = src + pos;
            if (bit_width <= 8) {
                // one group of 8 values = bit_width bytes = one u64
                // load, 8 shifts (vs 8 memcpys in the generic path)
                int64_t g = 0;
                uint32_t* o = out + produced;
                for (; (g + 1) * 8 <= take; ++g) {
                    uint64_t w = 0;
                    std::memcpy(&w, base + g * bit_width, bit_width);
                    for (int k = 0; k < 8; ++k)
                        o[g * 8 + k] =
                            (uint32_t)(w >> (k * bit_width)) & mask;
                }
                uint64_t bitpos = (uint64_t)g * 8 * bit_width;
                for (int64_t i = g * 8; i < take; ++i) {
                    int64_t byte_off = bitpos >> 3;
                    int bit_off = bitpos & 7;
                    uint64_t w = 0;
                    int64_t avail =
                        std::min<int64_t>(8, nbytes - byte_off);
                    std::memcpy(&w, base + byte_off, avail);
                    o[i] = (uint32_t)(w >> bit_off) & mask;
                    bitpos += bit_width;
                }
            } else {
                uint64_t bitpos = 0;
                for (int64_t i = 0; i < take; ++i) {
                    int64_t byte_off = bitpos >> 3;
                    int bit_off = bitpos & 7;
                    uint64_t w = 0;
                    int64_t avail =
                        std::min<int64_t>(8, nbytes - byte_off);
                    std::memcpy(&w, base + byte_off, avail);
                    out[produced + i] = (uint32_t)(w >> bit_off) & mask;
                    bitpos += bit_width;
                }
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
            // a bit-packed run CONSUMES groups*8 values on decode, so
            // extend the run with real values up to that boundary
            // (zero-padding is only legal at the very end of the data)
            j = std::min(start + groups * 8, count);
            if (!put_varint(((uint64_t)groups << 1) | 1)) return -1;
            int64_t nbytes = groups * bit_width;
            if (pos + nbytes > cap) return -1;
            if (bit_width <= 8) {
                // 8 values pack into one u64 (bit_width bytes stored)
                for (int64_t g = 0; g < groups; ++g) {
                    uint64_t w = 0;
                    int64_t b0 = start + g * 8;
                    int64_t lim = std::min<int64_t>(8, count - b0);
                    for (int64_t k = 0; k < lim; ++k)
                        w |= (uint64_t)(vals[b0 + k]) << (k * bit_width);
                    std::memcpy(dst + pos + g * bit_width, &w,
                                bit_width);
                }
            } else {
                std::memset(dst + pos, 0, nbytes);
                uint64_t bitpos = 0;
                for (int64_t k = 0; k < groups * 8; ++k) {
                    uint32_t v = (start + k < count) ? vals[start + k]
                                                     : 0;
                    int64_t byte_off = bitpos >> 3;
                    int bit_off = bitpos & 7;
                    uint64_t w = ((uint64_t)v) << bit_off;
                    for (int b = 0; b < 8 && byte_off + b < nbytes; ++b)
                        dst[pos + byte_off + b] |=
                            (uint8_t)(w >> (8 * b));
                    bitpos += bit_width;
                }
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

// dst physical capacity must be `cap`; when cap >= ulen + 16 the copy
// loops run 8/16 bytes at a time and may scribble into the slack past
// the logical output (the Python wrapper allocates ulen + 16).
int64_t snappy_decompress(const uint8_t* src, int64_t len,
                          uint8_t* dst, int64_t cap) {
    int64_t pos = 0;
    uint64_t ulen;
    if (uvarint(src, len, &pos, &ulen) < 0) return -1;
    if ((int64_t)ulen > cap) return -1;
    const bool slack = cap >= (int64_t)ulen + 16;
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
            uint8_t* to = dst + op;
            if (slack && offset >= 8) {
                // non-overlapping at word granularity: 16B chunks into
                // the slack region (classic snappy fast copy)
                int64_t i = 0;
                do {
                    std::memcpy(to + i, from + i, 8);
                    std::memcpy(to + i + 8, from + i + 8, 8);
                    i += 16;
                } while (i < n);
            } else if (slack) {
                // overlapping run (offset < 8): widen the pattern to an
                // 8-byte word, then copy 8-at-a-time into the slack
                if (offset == 1) {
                    uint64_t pat = 0x0101010101010101ULL * from[0];
                    for (int64_t i = 0; i < n; i += 8)
                        std::memcpy(to + i, &pat, 8);
                } else if (offset == 2) {
                    uint16_t p2; std::memcpy(&p2, from, 2);
                    uint64_t pat = 0x0001000100010001ULL * p2;
                    for (int64_t i = 0; i < n; i += 8)
                        std::memcpy(to + i, &pat, 8);
                } else if (offset == 4) {
                    uint32_t p4; std::memcpy(&p4, from, 4);
                    uint64_t pat = 0x0000000100000001ULL * p4;
                    for (int64_t i = 0; i < n; i += 8)
                        std::memcpy(to + i, &pat, 8);
                } else {
                    // 3/5/6/7: seed 8 bytes byte-wise, then copy from
                    // back = smallest multiple of offset >= 8 (pattern-
                    // preserving; source stays >= 8 behind the write)
                    int64_t seed = n < 8 ? n : 8;
                    for (int64_t i = 0; i < seed; ++i)
                        to[i] = from[i % offset];
                    int64_t back = offset * ((8 + offset - 1) / offset);
                    for (int64_t i = seed; i < n; i += 8)
                        std::memcpy(to + i, to + i - back, 8);
                }
            } else {
                for (int64_t i = 0; i < n; ++i) to[i] = from[i];
            }
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
    uint32_t skip = 32;   // snappy's incompressible-input acceleration
    while (ip < limit) {
        uint32_t h = (lz4_read32(src + ip) * 0x1e35a7bd) >> 18;
        int64_t cand = table[h];
        table[h] = (int32_t)ip;
        if (cand >= 0 && ip - cand <= 65535 &&
            lz4_read32(src + cand) == lz4_read32(src + ip)) {
            skip = 32;
            // extend 8 bytes at a time (XOR + ctz finds the divergence)
            int64_t m = 4;
            while (ip + m + 8 <= n) {
                uint64_t a, b;
                std::memcpy(&a, src + cand + m, 8);
                std::memcpy(&b, src + ip + m, 8);
                uint64_t x = a ^ b;
                if (x) { m += __builtin_ctzll(x) >> 3; goto extended; }
                m += 8;
            }
            while (ip + m < n && src[cand + m] == src[ip + m]) ++m;
        extended:
            if (ip > anchor) emit_literal(anchor, ip - anchor);
            emit_copy(ip - cand, m);
            ip += m;
            anchor = ip;
        } else {
            // on long literal runs, probe sparser and sparser
            ip += skip++ >> 5;
        }
    }
    if (anchor < n) emit_literal(anchor, n - anchor);
    return pos;
}

// ---- string engine ----------------------------------------------------------
//
// Native paths for the string kernels (arrow-string/src/predicate.rs:28
// fast paths, like.rs:79-186 semantics;
// generic_bytes_dictionary_builder.rs hash interning).  The engine keeps
// the dictionary-broadcast design (strings.py) but the value-touching
// loops run here instead of per-value Python.

// forward decl (defined above in this TU)
uint64_t xxhash64(const uint8_t* data, int64_t len, uint64_t seed);

// Hash-intern byte strings: codes[i] = dictionary code of row i (first-
// occurrence order); uniq_idx[k] = row index introducing code k.
// Returns the number of distinct values.
int64_t intern_varlen(const int64_t* offsets, const uint8_t* data,
                      int64_t n, int32_t* codes, int64_t* uniq_idx) {
    // ADAPTIVE table: start L1-resident and grow by rehashing the (few)
    // uniques when load passes 1/2.  The old fixed 2n-slot table was
    // ~24 MB at 1M rows — every probe a cache miss (~25 ns/row measured)
    // even for a 4-value dictionary; low-cardinality interning (the
    // common parquet dictionary page case) now stays in L1/L2.
    int64_t cap = 16;
    while (cap < 2 * n && cap < 1024) cap <<= 1;
    std::vector<int32_t> slots(cap, 0);   // code+1 (0 = empty)
    std::vector<uint64_t> hashes(cap, 0);
    std::vector<uint64_t> uniq_hash;
    uniq_hash.reserve(1024);
    int64_t n_uniq = 0;
    uint64_t mask = cap - 1;
    auto grow = [&]() {
        cap <<= 2;
        mask = cap - 1;
        slots.assign(cap, 0);
        hashes.assign(cap, 0);
        for (int64_t c = 0; c < n_uniq; ++c) {
            uint64_t j = uniq_hash[c] & mask;
            while (slots[j] != 0) j = (j + 1) & mask;
            slots[j] = (int32_t)(c + 1);
            hashes[j] = uniq_hash[c];
        }
    };
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* s = data + offsets[i];
        const int64_t len = offsets[i + 1] - offsets[i];
        const uint64_t h = xxhash64(s, len, 0);
        uint64_t j = h & mask;
        while (true) {
            int32_t c = slots[j];
            if (c == 0) {
                if (2 * (n_uniq + 1) >= cap) {
                    grow();
                    j = h & mask;
                    while (slots[j] != 0) j = (j + 1) & mask;
                }
                slots[j] = (int32_t)(n_uniq + 1);
                hashes[j] = h;
                uniq_idx[n_uniq] = i;
                uniq_hash.push_back(h);
                codes[i] = (int32_t)n_uniq;
                ++n_uniq;
                break;
            }
            int64_t u = uniq_idx[c - 1];
            if (hashes[j] == h &&
                offsets[u + 1] - offsets[u] == len &&
                std::memcmp(data + offsets[u], s, len) == 0) {
                codes[i] = c - 1;
                break;
            }
            j = (j + 1) & mask;
        }
    }
    return n_uniq;
}

static inline uint8_t ascii_lower(uint8_t c) {
    return (c >= 'A' && c <= 'Z') ? c + 32 : c;
}

// UTF-8 aware SQL LIKE: '%' any run, '_' one codepoint, '\' escapes.
// ci = ASCII case-insensitive.  Iterative two-pointer algorithm.
static bool like_one(const uint8_t* s, int64_t slen,
                     const uint8_t* p, int64_t plen, bool ci) {
    int64_t si = 0, pi = 0, star_si = -1, star_pi = -1;
    auto eq = [&](uint8_t a, uint8_t b) {
        return ci ? ascii_lower(a) == ascii_lower(b) : a == b;
    };
    auto next_char = [](const uint8_t* str, int64_t len, int64_t pos) {
        ++pos;
        while (pos < len && (str[pos] & 0xC0) == 0x80) ++pos;
        return pos;
    };
    while (si < slen) {
        if (pi < plen) {
            uint8_t pc = p[pi];
            if (pc == '%') {
                star_pi = ++pi;
                star_si = si;
                continue;
            }
            if (pc == '_') {
                si = next_char(s, slen, si);
                ++pi;
                continue;
            }
            if (pc == '\\' && pi + 1 < plen) {
                pc = p[pi + 1];
                if (eq(s[si], pc)) { ++si; pi += 2; continue; }
            } else if (eq(s[si], pc)) {
                ++si; ++pi;
                continue;
            }
        }
        if (star_pi < 0) return false;
        star_si = next_char(s, slen, star_si);
        si = star_si;
        pi = star_pi;
    }
    while (pi < plen && p[pi] == '%') ++pi;
    return pi == plen;
}

// op: 0 like, 1 starts_with, 2 ends_with, 3 contains, 4 eq
void bytes_match(const int64_t* offsets, const uint8_t* data, int64_t n,
                 const uint8_t* pat, int64_t plen, int32_t op,
                 uint8_t ci, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* s = data + offsets[i];
        const int64_t len = offsets[i + 1] - offsets[i];
        bool r = false;
        switch (op) {
        case 0: r = like_one(s, len, pat, plen, ci); break;
        case 1:
            r = len >= plen;
            if (r) {
                if (ci) {
                    for (int64_t k = 0; k < plen; ++k)
                        if (ascii_lower(s[k]) != ascii_lower(pat[k])) {
                            r = false; break;
                        }
                } else {
                    r = std::memcmp(s, pat, plen) == 0;
                }
            }
            break;
        case 2:
            r = len >= plen;
            if (r) {
                const uint8_t* tail = s + len - plen;
                if (ci) {
                    for (int64_t k = 0; k < plen; ++k)
                        if (ascii_lower(tail[k]) != ascii_lower(pat[k])) {
                            r = false; break;
                        }
                } else {
                    r = std::memcmp(tail, pat, plen) == 0;
                }
            }
            break;
        case 3:
            if (plen == 0) { r = true; break; }
            if (!ci) {
                r = len >= plen && memmem(s, len, pat, plen) != nullptr;
            } else {
                r = false;
                for (int64_t k = 0; k + plen <= len && !r; ++k) {
                    r = true;
                    for (int64_t m = 0; m < plen; ++m)
                        if (ascii_lower(s[k + m]) != ascii_lower(pat[m])) {
                            r = false; break;
                        }
                }
            }
            break;
        case 4:
            r = len == plen;
            if (r) {
                if (ci) {
                    for (int64_t k = 0; k < plen; ++k)
                        if (ascii_lower(s[k]) != ascii_lower(pat[k])) {
                            r = false; break;
                        }
                } else {
                    r = std::memcmp(s, pat, plen) == 0;
                }
            }
            break;
        }
        out[i] = r ? 1 : 0;
    }
}

// Per-value byte comparison against one scalar: out[i] = -1/0/1
// (lexicographic, length-breaks-ties; the arrow byte-compare order).
void bytes_cmp_scalar(const int64_t* offsets, const uint8_t* data,
                      int64_t n, const uint8_t* pat, int64_t plen,
                      int8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* s = data + offsets[i];
        const int64_t len = offsets[i + 1] - offsets[i];
        const int64_t m = len < plen ? len : plen;
        int c = std::memcmp(s, pat, m);
        if (c == 0) c = len < plen ? -1 : (len > plen ? 1 : 0);
        out[i] = c < 0 ? -1 : (c > 0 ? 1 : 0);
    }
}

// ASCII upper/lower over the whole data buffer; returns 0 if any
// non-ASCII byte was seen (caller falls back to the Unicode path).
int64_t ascii_case(const uint8_t* data, int64_t n, int32_t to_upper,
                   uint8_t* out) {
    uint8_t seen_high = 0;
    if (to_upper) {
        for (int64_t i = 0; i < n; ++i) {
            uint8_t c = data[i];
            seen_high |= c;
            out[i] = (c >= 'a' && c <= 'z') ? c - 32 : c;
        }
    } else {
        for (int64_t i = 0; i < n; ++i) {
            uint8_t c = data[i];
            seen_high |= c;
            out[i] = (c >= 'A' && c <= 'Z') ? c + 32 : c;
        }
    }
    return (seen_high & 0x80) ? 0 : 1;
}

// UTF-8 character-based substring (arrow-string/src/substring.rs):
// start may be negative (from end); length < 0 = to end.
// Writes new offsets and packed data; returns total output bytes.
int64_t utf8_substring(const int64_t* offsets, const uint8_t* data,
                       int64_t n, int64_t start, int64_t length,
                       int64_t* out_offsets, uint8_t* out_data) {
    int64_t total = 0;
    out_offsets[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* s = data + offsets[i];
        const int64_t len = offsets[i + 1] - offsets[i];
        // index char boundaries
        int64_t nchars = 0;
        for (int64_t k = 0; k < len; ++k)
            nchars += (s[k] & 0xC0) != 0x80;
        int64_t c0 = start >= 0 ? start
                                : std::max<int64_t>(0, nchars + start);
        int64_t c1 = length < 0 ? nchars
                                : std::min<int64_t>(nchars, c0 + length);
        if (c0 >= c1 || c0 >= nchars) {
            out_offsets[i + 1] = total;
            continue;
        }
        // byte positions of char c0 and c1
        int64_t b0 = -1, b1 = len, seen = 0;
        for (int64_t k = 0; k < len; ++k) {
            if ((s[k] & 0xC0) != 0x80) {
                if (seen == c0) b0 = k;
                if (seen == c1) { b1 = k; break; }
                ++seen;
            }
        }
        if (b0 < 0) { out_offsets[i + 1] = total; continue; }
        std::memcpy(out_data + total, s + b0, b1 - b0);
        total += b1 - b0;
        out_offsets[i + 1] = total;
    }
    return total;
}

// Lexicographic argsort of byte strings (dictionary value ordering)
void argsort_varlen(const int64_t* offsets, const uint8_t* data,
                    int64_t n, uint32_t* out) {
    std::iota(out, out + n, 0u);
    std::sort(out, out + n, [&](uint32_t a, uint32_t b) {
        const int64_t la = offsets[a + 1] - offsets[a];
        const int64_t lb = offsets[b + 1] - offsets[b];
        const int c = std::memcmp(data + offsets[a], data + offsets[b],
                                  std::min(la, lb));
        return c != 0 ? c < 0 : la < lb;
    });
}

// Gather byte strings by index -> packed (offsets, data).  Returns total
// output bytes.
int64_t gather_varlen(const int64_t* offsets, const uint8_t* data,
                      const int64_t* idx, int64_t n,
                      int64_t* out_offsets, uint8_t* out_data) {
    int64_t total = 0;
    out_offsets[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t j = idx[i];
        const int64_t len = offsets[j + 1] - offsets[j];
        std::memcpy(out_data + total, data + offsets[j], len);
        total += len;
        out_offsets[i + 1] = total;
    }
    return total;
}

// ---- CSV engine -------------------------------------------------------------
//
// Native typed CSV parsing (arrow-csv/src/reader/mod.rs:555 re-design):
// one indexing pass over the byte buffer (RFC 4180 quotes), then typed
// per-column parsers over the field bounds.  Python (io/csv.py) does
// schema inference and assembly.

// Index fields: writes (start, end) byte bounds per field (quotes
// stripped) and a per-field "has escaped quote" flag.  Returns the
// number of fields, -1 on overflow, -2 on ragged rows (the column count
// is fixed by the first record).  CRLF tolerated.
int64_t csv_index(const uint8_t* data, int64_t len, uint8_t delim,
                  uint8_t quote, int64_t* starts, int64_t* ends,
                  uint8_t* escaped, int64_t max_fields,
                  int64_t* nrows_out, int64_t* ncols_out) {
    int64_t nf = 0, pos = 0, ncols = -1, col = 0, nrows = 0;
    while (pos < len) {
        // one field
        if (nf >= max_fields) return -1;
        uint8_t esc = 0;
        int64_t fs, fe;
        if (data[pos] == quote) {
            fs = ++pos;
            while (pos < len) {
                if (data[pos] == quote) {
                    if (pos + 1 < len && data[pos + 1] == quote) {
                        esc = 1;
                        pos += 2;
                        continue;
                    }
                    break;
                }
                ++pos;
            }
            fe = pos;
            if (pos < len) ++pos;      // closing quote
        } else {
            fs = pos;
            // SWAR scan to the next delimiter/newline: 8 bytes per
            // iteration (the per-byte loop measured ~450 MB/s; this is
            // the indexer's hot path)
            const uint64_t ones = 0x0101010101010101ULL;
            const uint64_t high = 0x8080808080808080ULL;
            const uint64_t dpat = ones * delim;
            while (pos + 8 <= len) {
                uint64_t w;
                std::memcpy(&w, data + pos, 8);
                uint64_t xd = w ^ dpat;
                uint64_t xn = w ^ 0x0A0A0A0A0A0A0A0AULL;
                uint64_t hit = ((xd - ones) & ~xd & high)
                             | ((xn - ones) & ~xn & high);
                if (hit) {
                    pos += __builtin_ctzll(hit) >> 3;
                    break;
                }
                pos += 8;
            }
            while (pos < len && data[pos] != delim && data[pos] != '\n')
                ++pos;
            fe = pos;
            if (fe > fs && data[fe - 1] == '\r') --fe;
        }
        starts[nf] = fs;
        ends[nf] = fe;
        escaped[nf] = esc;
        ++nf;
        ++col;
        if (pos >= len || data[pos] == '\n') {
            if (pos < len) ++pos;
            if (ncols < 0) ncols = col;
            else if (col != ncols) return -2;
            col = 0;
            ++nrows;
            // skip trailing blank line
            if (pos >= len) break;
        } else {
            ++pos;                     // delimiter
        }
    }
    if (col != 0) {                    // final record without newline
        if (ncols < 0) ncols = col;
        else if (col != ncols) return -2;
        ++nrows;
    }
    *nrows_out = nrows;
    *ncols_out = ncols < 0 ? 0 : ncols;
    return nf;
}

// Extract (unescape) string fields -> packed offsets+data.  Returns
// total bytes.
int64_t csv_extract(const uint8_t* data, const int64_t* starts,
                    const int64_t* ends, const uint8_t* escaped,
                    int64_t n, uint8_t quote, int64_t* out_offsets,
                    uint8_t* out_data) {
    int64_t total = 0;
    out_offsets[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t fs = starts[i], fe = ends[i];
        if (!escaped[i]) {
            std::memcpy(out_data + total, data + fs, fe - fs);
            total += fe - fs;
        } else {
            for (int64_t p = fs; p < fe; ++p) {
                out_data[total++] = data[p];
                if (data[p] == quote && p + 1 < fe
                    && data[p + 1] == quote) ++p;
            }
        }
        out_offsets[i + 1] = total;
    }
    return total;
}

// Typed field parsers.  Empty fields -> null.  Returns -1 on success or
// the index of the first unparseable field (inference probes rely on
// this).
int64_t csv_parse_i64(const uint8_t* data, const int64_t* starts,
                      const int64_t* ends, int64_t n, int64_t* out,
                      uint8_t* valid) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t p = starts[i], e = ends[i];
        if (p == e) { valid[i] = 0; out[i] = 0; continue; }
        bool neg = false;
        if (data[p] == '+' || data[p] == '-') {
            neg = data[p] == '-';
            ++p;
        }
        if (p == e) return i;
        uint64_t acc = 0;
        for (; p < e; ++p) {
            uint8_t c = data[p];
            if (c < '0' || c > '9') return i;
            if (acc > (uint64_t)1844674407370955161ULL) return i;
            acc = acc * 10 + (c - '0');
        }
        if (acc > 0x8000000000000000ULL - (neg ? 0 : 1)) return i;
        out[i] = neg ? -(int64_t)acc : (int64_t)acc;
        valid[i] = 1;
    }
    return -1;
}

int64_t csv_parse_f64(const uint8_t* data, const int64_t* starts,
                      const int64_t* ends, int64_t n, double* out,
                      uint8_t* valid) {
    // std::from_chars<double> (GCC >= 11) is a correctly-rounded
    // Eisel-Lemire-grade parser, ~5x strtod and locale-independent.
    for (int64_t i = 0; i < n; ++i) {
        int64_t p = starts[i], e = ends[i];
        if (p == e) { valid[i] = 0; out[i] = 0.0; continue; }
        const char* b = (const char*)data + p;
        const char* bend = (const char*)data + e;
        if (*b == '+') ++b;            // from_chars rejects leading '+'
        double v;
        auto r = std::from_chars(b, bend, v);
        if (r.ec != std::errc() || r.ptr != bend) return i;
        out[i] = v;
        valid[i] = 1;
    }
    return -1;
}

// Arbitrary (start, len) byte-range gather into a packed output.
void gather_ranges(const uint8_t* src, const int64_t* starts,
                   const int64_t* lens, const int64_t* out_offs,
                   int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i)
        if (lens[i] > 0)
            std::memcpy(out + out_offs[i], src + starts[i], lens[i]);
}

// ---- variant path extraction ------------------------------------------------
// Columnar variant_get (parquet-variant-compute/src/variant_get.rs:35
// re-designed: the reference walks rows in Rust; this walks them here,
// with a per-batch metadata cache, instead of per-row Python).
// Binary layout per the Parquet Variant spec (basic type in bits 0-1:
// 0 primitive / 1 short string / 2 object / 3 array).

static inline uint64_t var_uint(const uint8_t* p, int w) {
    uint64_t v = 0;
    std::memcpy(&v, p, w);
    return v & ((w >= 8) ? ~0ULL : ((1ULL << (8 * w)) - 1));
}

// total encoded size of the value starting at p (bounded by end)
static int64_t var_value_size(const uint8_t* p, const uint8_t* end) {
    if (p >= end) return -1;
    uint8_t head = *p;
    int basic = head & 3;
    if (basic == 1) return 1 + (head >> 2);          // short string
    if (basic == 0) {
        int tid = head >> 2;
        static const int w[] = {0, 0, 0, 1, 2, 4, 8, 8, 5, 9, 17,
                                4, 8, 8, 4, -1, -1};
        if (tid <= 14) return 1 + w[tid];
        if (tid == 15 || tid == 16) {                // binary / string
            if (p + 5 > end) return -1;
            uint32_t ln;
            std::memcpy(&ln, p + 1, 4);
            return 5 + (int64_t)ln;
        }
        return -1;
    }
    if (basic == 3) {                                // array
        int ow = ((head >> 2) & 3) + 1;
        int large = (head >> 4) & 1;
        const uint8_t* q = p + 1;
        if (q + (large ? 4 : 1) > end) return -1;
        int64_t n = (int64_t)var_uint(q, large ? 4 : 1);
        q += large ? 4 : 1;
        if (q + ow * (n + 1) > end) return -1;
        int64_t last = (int64_t)var_uint(q + ow * n, ow);
        return (q - p) + ow * (n + 1) + last;
    }
    // object
    {
        int ow = ((head >> 2) & 3) + 1;
        int iw = ((head >> 4) & 3) + 1;
        int large = (head >> 6) & 1;
        const uint8_t* q = p + 1;
        if (q + (large ? 4 : 1) > end) return -1;
        int64_t n = (int64_t)var_uint(q, large ? 4 : 1);
        q += large ? 4 : 1;
        if (q + iw * n + ow * (n + 1) > end) return -1;
        int64_t last = (int64_t)var_uint(q + iw * n + ow * n, ow);
        return (q - p) + iw * n + ow * (n + 1) + last;
    }
}

// Resolve key -> field id in one metadata dictionary; -1 if absent.
static int64_t var_key_id(const uint8_t* md, int64_t mlen,
                          const uint8_t* key, int64_t klen) {
    if (mlen < 1) return -1;
    int ow = ((md[0] >> 6) & 3) + 1;
    if (1 + ow > mlen) return -1;
    int64_t n = (int64_t)var_uint(md + 1, ow);
    if (1 + ow * (n + 2) > mlen) return -1;
    const uint8_t* offs = md + 1 + ow;
    const uint8_t* base = md + 1 + ow * (n + 2);
    for (int64_t j = 0; j < n; ++j) {
        int64_t a = (int64_t)var_uint(offs + ow * j, ow);
        int64_t b = (int64_t)var_uint(offs + ow * (j + 1), ow);
        if (b - a == klen && base + b <= md + mlen
            && std::memcmp(base + a, key, klen) == 0)
            return j;
    }
    return -1;
}

// Path walk over a variant batch.
//   values/voffs, metas/moffs: packed rows (offsets length n+1)
//   n_steps, step_kind (0 = object key, 1 = array index),
//   step_index (array index for kind 1), key_starts (n_steps+1 into
//   keys_buf, kind-0 key bytes)
//   out_start/out_len: absolute range of the extracted sub-value in
//   `values`; len -1 = missing path / null row
// Returns 0, or -(row+1) on malformed input.
int64_t variant_get_path(const uint8_t* values, const int64_t* voffs,
                         const uint8_t* metas, const int64_t* moffs,
                         int64_t n, int64_t n_steps,
                         const uint8_t* step_kind,
                         const int64_t* step_index,
                         const int64_t* key_starts,
                         const uint8_t* keys_buf,
                         int64_t* out_start, int64_t* out_len) {
    // metadata cache: rows from one builder batch usually share
    // identical dictionaries, so key->id resolutions carry over
    const uint8_t* cached_md = nullptr;
    int64_t cached_mlen = -1;
    std::vector<int64_t> cached_ids(n_steps, -1);
    for (int64_t i = 0; i < n; ++i) {
        out_start[i] = 0;
        out_len[i] = -1;
        int64_t vs = voffs[i], ve = voffs[i + 1];
        if (vs >= ve) continue;                      // null row
        const uint8_t* md = metas + moffs[i];
        int64_t mlen = moffs[i + 1] - moffs[i];
        bool same = cached_md != nullptr && mlen == cached_mlen
                    && (md == cached_md
                        || std::memcmp(md, cached_md, mlen) == 0);
        if (!same) {
            for (int64_t k = 0; k < n_steps; ++k)
                if (step_kind[k] == 0)
                    cached_ids[k] = var_key_id(
                        md, mlen, keys_buf + key_starts[k],
                        key_starts[k + 1] - key_starts[k]);
            cached_md = md;
            cached_mlen = mlen;
        }
        const uint8_t* end = values + ve;
        int64_t pos = vs;
        bool miss = false;
        for (int64_t k = 0; k < n_steps && !miss; ++k) {
            const uint8_t* p = values + pos;
            if (p >= end) return -(i + 1);
            uint8_t head = *p;
            int basic = head & 3;
            if (step_kind[k] == 0) {
                if (basic != 2 || cached_ids[k] < 0) { miss = true; break; }
                int ow = ((head >> 2) & 3) + 1;
                int iw = ((head >> 4) & 3) + 1;
                int large = (head >> 6) & 1;
                const uint8_t* q = p + 1;
                if (q + (large ? 4 : 1) > end) return -(i + 1);
                int64_t cnt = (int64_t)var_uint(q, large ? 4 : 1);
                q += large ? 4 : 1;
                if (q + iw * cnt + ow * (cnt + 1) > end) return -(i + 1);
                int64_t want = cached_ids[k];
                int64_t found = -1;
                for (int64_t j = 0; j < cnt; ++j) {
                    if ((int64_t)var_uint(q + iw * j, iw) == want) {
                        found = j;
                        break;
                    }
                }
                if (found < 0) { miss = true; break; }
                const uint8_t* offs = q + iw * cnt;
                const uint8_t* base = offs + ow * (cnt + 1);
                pos = (base - values)
                      + (int64_t)var_uint(offs + ow * found, ow);
            } else {
                if (basic != 3) { miss = true; break; }
                int ow = ((head >> 2) & 3) + 1;
                int large = (head >> 4) & 1;
                const uint8_t* q = p + 1;
                if (q + (large ? 4 : 1) > end) return -(i + 1);
                int64_t cnt = (int64_t)var_uint(q, large ? 4 : 1);
                q += large ? 4 : 1;
                int64_t idx = step_index[k];
                if (idx < 0 || idx >= cnt) { miss = true; break; }
                if (q + ow * (cnt + 1) > end) return -(i + 1);
                const uint8_t* base = q + ow * (cnt + 1);
                pos = (base - values)
                      + (int64_t)var_uint(q + ow * idx, ow);
            }
        }
        if (miss) continue;
        int64_t sz = var_value_size(values + pos, end);
        if (sz < 0 || pos + sz > ve) return -(i + 1);
        out_start[i] = pos;
        out_len[i] = sz;
    }
    return 0;
}

// One pass counting delimiter + newline bytes (the field-count upper
// bound for csv_index capacity, replacing two numpy compare+sum passes).
int64_t csv_count_seps(const uint8_t* data, int64_t len, uint8_t delim) {
    int64_t cnt = 0;
    int64_t i = 0;
    for (; i + 8 <= len; i += 8) {
        uint64_t w;
        std::memcpy(&w, data + i, 8);
        // SWAR byte-equality: whole-word compare against both targets
        uint64_t xd = w ^ (0x0101010101010101ULL * delim);
        uint64_t xn = w ^ 0x0A0A0A0A0A0A0A0AULL;
        uint64_t md = (xd - 0x0101010101010101ULL) & ~xd
                      & 0x8080808080808080ULL;
        uint64_t mn = (xn - 0x0101010101010101ULL) & ~xn
                      & 0x8080808080808080ULL;
        cnt += __builtin_popcountll(md) + __builtin_popcountll(mn);
    }
    for (; i < len; ++i)
        cnt += (data[i] == delim) + (data[i] == '\n');
    return cnt;
}

int64_t csv_parse_bool(const uint8_t* data, const int64_t* starts,
                       const int64_t* ends, int64_t n, uint8_t* out,
                       uint8_t* valid) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t p = starts[i], e = ends[i];
        int64_t ln = e - p;
        if (ln == 0) { valid[i] = 0; out[i] = 0; continue; }
        char b[8];
        if (ln > 5) return i;
        for (int64_t k = 0; k < ln; ++k) b[k] = ascii_lower(data[p + k]);
        if (ln == 4 && std::memcmp(b, "true", 4) == 0) out[i] = 1;
        else if (ln == 5 && std::memcmp(b, "false", 5) == 0) out[i] = 0;
        else return i;
        valid[i] = 1;
    }
    return -1;
}

// ISO dates/timestamps: YYYY-MM-DD[ T]HH:MM:SS[.frac][Z].  Output in
// `unit` ns per tick (1e9 -> seconds...); date_only restricts to the
// date form.  Returns -1 ok, else first bad index.
int64_t csv_parse_timestamp(const uint8_t* data, const int64_t* starts,
                            const int64_t* ends, int64_t n,
                            int64_t out_scale_ns, int32_t date_only,
                            int64_t* out, uint8_t* valid) {
    auto digits = [&](int64_t p, int64_t k, const uint8_t* d,
                      int64_t* v) -> bool {
        int64_t acc = 0;
        for (int64_t i = 0; i < k; ++i) {
            uint8_t c = d[p + i];
            if (c < '0' || c > '9') return false;
            acc = acc * 10 + (c - '0');
        }
        *v = acc;
        return true;
    };
    for (int64_t i = 0; i < n; ++i) {
        int64_t p = starts[i], e = ends[i];
        int64_t ln = e - p;
        if (ln == 0) { valid[i] = 0; out[i] = 0; continue; }
        if (ln < 10) return i;
        int64_t Y, M, D;
        if (!digits(p, 4, data, &Y) || data[p + 4] != '-'
            || !digits(p + 5, 2, data, &M) || data[p + 7] != '-'
            || !digits(p + 8, 2, data, &D)) return i;
        if (M < 1 || M > 12 || D < 1 || D > 31) return i;
        // days-from-civil
        int64_t y = Y - (M <= 2 ? 1 : 0);
        int64_t era = (y >= 0 ? y : y - 399) / 400;
        int64_t yoe = y - era * 400;
        int64_t mp = M > 2 ? M - 3 : M + 9;
        int64_t doy = (153 * mp + 2) / 5 + D - 1;
        int64_t doe = 365 * yoe + yoe / 4 - yoe / 100 + doy;
        int64_t days = era * 146097 + doe - 719468;
        int64_t ns = days * 86400LL * 1000000000LL;
        int64_t q = p + 10;
        if (q < e) {
            if (date_only) return i;
            if (data[q] != ' ' && data[q] != 'T') return i;
            ++q;
            int64_t hh, mm, ss;
            if (q + 8 > e || !digits(q, 2, data, &hh)
                || data[q + 2] != ':' || !digits(q + 3, 2, data, &mm)
                || data[q + 5] != ':' || !digits(q + 6, 2, data, &ss))
                return i;
            if (hh > 23 || mm > 59 || ss > 60) return i;
            ns += (hh * 3600 + mm * 60 + ss) * 1000000000LL;
            q += 8;
            if (q < e && data[q] == '.') {
                ++q;
                int64_t frac = 0, scale = 100000000LL;
                while (q < e && data[q] >= '0' && data[q] <= '9') {
                    frac += (data[q] - '0') * scale;
                    scale /= 10;
                    ++q;
                }
                ns += frac;
            }
            if (q < e && (data[q] == 'Z' || data[q] == 'z')) ++q;
            if (q != e) return i;
        }
        out[i] = ns / out_scale_ns;
        valid[i] = 1;
    }
    return -1;
}

// PLAIN byte-array ENCODE: (offsets, data) -> u32-length-prefixed
// stream (inverse of plain_byte_array_decode; the write path).
int64_t plain_byte_array_encode(const int64_t* offsets,
                                const uint8_t* data, int64_t n,
                                uint8_t* out, int64_t cap) {
    int64_t pos = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t len = offsets[i + 1] - offsets[i];
        if (pos + 4 + len > cap) return -1;
        uint32_t l32 = (uint32_t)len;
        std::memcpy(out + pos, &l32, 4);
        std::memcpy(out + pos + 4, data + offsets[i], len);
        pos += 4 + len;
    }
    return pos;
}

// ---- JSON tape tokenizer ----------------------------------------------------
//
// arrow-json/src/reader/tape.rs re-design: one pass over the bytes
// emits a flat tape of (token type, start, end); Python assembles
// columns from the tape and reuses the CSV typed parsers for numbers.
// Token types: 0 { , 1 } , 2 [ , 3 ] , 4 key, 5 string, 6 number,
// 7 true, 8 false, 9 null.  String/key bounds exclude the quotes;
// `esc` marks strings containing backslash escapes.

int64_t json_tape(const uint8_t* data, int64_t len, uint8_t* types,
                  int64_t* starts, int64_t* ends, uint8_t* escs,
                  int64_t cap) {
    int64_t nt = 0, pos = 0;
    bool expect_key = false;
    bool after_key = false;
    // small explicit stack of container kinds: 0 obj, 1 arr
    std::vector<uint8_t> stack;
    stack.reserve(64);
    auto push_tok = [&](uint8_t t, int64_t s, int64_t e,
                        uint8_t esc) -> bool {
        if (nt >= cap) return false;
        types[nt] = t;
        starts[nt] = s;
        ends[nt] = e;
        escs[nt] = esc;
        ++nt;
        return true;
    };
    while (pos < len) {
        uint8_t c = data[pos];
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r'
            || c == ',' || c == ':') {
            ++pos;
            continue;
        }
        if (c == '{') {
            if (!push_tok(0, pos, pos + 1, 0)) return -1;
            stack.push_back(0);
            expect_key = true;
            after_key = false;
            ++pos;
            continue;
        }
        if (c == '}') {
            if (stack.empty() || stack.back() != 0 || after_key)
                return -2;
            stack.pop_back();
            if (!push_tok(1, pos, pos + 1, 0)) return -1;
            expect_key = !stack.empty() && stack.back() == 0;
            ++pos;
            continue;
        }
        if (c == '[') {
            if (!push_tok(2, pos, pos + 1, 0)) return -1;
            stack.push_back(1);
            expect_key = false;
            after_key = false;
            ++pos;
            continue;
        }
        if (c == ']') {
            if (stack.empty() || stack.back() != 1 || after_key)
                return -2;
            stack.pop_back();
            if (!push_tok(3, pos, pos + 1, 0)) return -1;
            expect_key = !stack.empty() && stack.back() == 0;
            ++pos;
            continue;
        }
        if (c == '"') {
            int64_t s = ++pos;
            uint8_t esc = 0;
            while (pos < len && data[pos] != '"') {
                if (data[pos] == '\\') {
                    esc = 1;
                    pos += 2;
                } else {
                    ++pos;
                }
            }
            if (pos >= len) return -2;
            // a string is a KEY iff we are directly in an object and
            // expecting one
            uint8_t t = (!stack.empty() && stack.back() == 0
                         && expect_key) ? 4 : 5;
            if (!push_tok(t, s, pos, esc)) return -1;
            ++pos;
            if (t == 4) { expect_key = false; after_key = true; }
            else {
                expect_key = !stack.empty() && stack.back() == 0;
                after_key = false;
            }
            continue;
        }
        if (c == 't' && pos + 4 <= len
            && std::memcmp(data + pos, "true", 4) == 0) {
            if (!push_tok(7, pos, pos + 4, 0)) return -1;
            pos += 4;
            expect_key = !stack.empty() && stack.back() == 0;
            after_key = false;
            continue;
        }
        if (c == 'f' && pos + 5 <= len
            && std::memcmp(data + pos, "false", 5) == 0) {
            if (!push_tok(8, pos, pos + 5, 0)) return -1;
            pos += 5;
            expect_key = !stack.empty() && stack.back() == 0;
            after_key = false;
            continue;
        }
        if (c == 'n' && pos + 4 <= len
            && std::memcmp(data + pos, "null", 4) == 0) {
            if (!push_tok(9, pos, pos + 4, 0)) return -1;
            pos += 4;
            expect_key = !stack.empty() && stack.back() == 0;
            after_key = false;
            continue;
        }
        if (c == '-' || (c >= '0' && c <= '9')) {
            int64_t s = pos;
            while (pos < len) {
                uint8_t d = data[pos];
                if ((d >= '0' && d <= '9') || d == '-' || d == '+'
                    || d == '.' || d == 'e' || d == 'E') ++pos;
                else break;
            }
            if (!push_tok(6, s, pos, 0)) return -1;
            expect_key = !stack.empty() && stack.back() == 0;
            after_key = false;
            continue;
        }
        return -2;                     // malformed
    }
    return stack.empty() ? nt : -2;
}

// Unescape JSON strings -> packed offsets+data (UTF-8; \uXXXX incl.
// surrogate pairs).  Returns total bytes or -1 on malformed escapes.
int64_t json_unescape(const uint8_t* data, const int64_t* starts,
                      const int64_t* ends, const uint8_t* escs,
                      int64_t n, int64_t* out_offsets,
                      uint8_t* out_data) {
    auto hex4 = [&](int64_t p) -> int32_t {
        int32_t v = 0;
        for (int i = 0; i < 4; ++i) {
            uint8_t c = data[p + i];
            int32_t d;
            if (c >= '0' && c <= '9') d = c - '0';
            else if (c >= 'a' && c <= 'f') d = c - 'a' + 10;
            else if (c >= 'A' && c <= 'F') d = c - 'A' + 10;
            else return -1;
            v = (v << 4) | d;
        }
        return v;
    };
    auto put_utf8 = [&](int64_t& t, int32_t cp) {
        if (cp < 0x80) {
            out_data[t++] = (uint8_t)cp;
        } else if (cp < 0x800) {
            out_data[t++] = 0xC0 | (cp >> 6);
            out_data[t++] = 0x80 | (cp & 0x3F);
        } else if (cp < 0x10000) {
            out_data[t++] = 0xE0 | (cp >> 12);
            out_data[t++] = 0x80 | ((cp >> 6) & 0x3F);
            out_data[t++] = 0x80 | (cp & 0x3F);
        } else {
            out_data[t++] = 0xF0 | (cp >> 18);
            out_data[t++] = 0x80 | ((cp >> 12) & 0x3F);
            out_data[t++] = 0x80 | ((cp >> 6) & 0x3F);
            out_data[t++] = 0x80 | (cp & 0x3F);
        }
    };
    int64_t total = 0;
    out_offsets[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t p = starts[i], e = ends[i];
        if (!escs[i]) {
            std::memcpy(out_data + total, data + p, e - p);
            total += e - p;
        } else {
            while (p < e) {
                if (data[p] != '\\') {
                    out_data[total++] = data[p++];
                    continue;
                }
                if (p + 1 >= e) return -1;
                uint8_t k = data[p + 1];
                p += 2;
                switch (k) {
                case '"': out_data[total++] = '"'; break;
                case '\\': out_data[total++] = '\\'; break;
                case '/': out_data[total++] = '/'; break;
                case 'b': out_data[total++] = '\b'; break;
                case 'f': out_data[total++] = '\f'; break;
                case 'n': out_data[total++] = '\n'; break;
                case 'r': out_data[total++] = '\r'; break;
                case 't': out_data[total++] = '\t'; break;
                case 'u': {
                    if (p + 4 > e) return -1;
                    int32_t cp = hex4(p);
                    if (cp < 0) return -1;
                    p += 4;
                    if (cp >= 0xD800 && cp < 0xDC00 && p + 6 <= e
                        && data[p] == '\\' && data[p + 1] == 'u') {
                        int32_t lo = hex4(p + 2);
                        if (lo >= 0xDC00 && lo < 0xE000) {
                            cp = 0x10000 + ((cp - 0xD800) << 10)
                                 + (lo - 0xDC00);
                            p += 6;
                        }
                    }
                    put_utf8(total, cp);
                    break;
                }
                default: return -1;
                }
            }
        }
        out_offsets[i + 1] = total;
    }
    return total;
}

// UTF-8 character counts per value (length kernel)
void utf8_char_lengths(const int64_t* offsets, const uint8_t* data,
                       int64_t n, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* s = data + offsets[i];
        const int64_t len = offsets[i + 1] - offsets[i];
        int64_t c = 0;
        for (int64_t k = 0; k < len; ++k) c += (s[k] & 0xC0) != 0x80;
        out[i] = c;
    }
}


// ---------------------------------------------------------------------------
// Arrow C Data Interface release callbacks (arrow-data/src/ffi.rs:39 role).
// The Python exporter allocates every nested struct, string, and buffer
// with cdata_malloc; these releases free the whole tree natively so a
// consumer may call them at ANY time -- including after the Python
// interpreter has finalized (ctypes trampolines would crash there).
struct CArrowSchema {
    const char* format;
    const char* name;
    const char* metadata;
    int64_t flags;
    int64_t n_children;
    CArrowSchema** children;
    CArrowSchema* dictionary;
    void (*release)(CArrowSchema*);
    void* private_data;
};

struct CArrowArray {
    int64_t length;
    int64_t null_count;
    int64_t offset;
    int64_t n_buffers;
    int64_t n_children;
    const void** buffers;
    CArrowArray** children;
    CArrowArray* dictionary;
    void (*release)(CArrowArray*);
    void* private_data;
};

void* cdata_malloc(int64_t size) { return std::calloc(1, (size_t)size); }

void cdata_release_schema(CArrowSchema* s) {
    if (!s || !s->release) return;
    std::free((void*)s->format);
    std::free((void*)s->name);
    std::free((void*)s->metadata);
    for (int64_t i = 0; i < s->n_children; ++i) {
        CArrowSchema* c = s->children[i];
        if (c) {
            if (c->release) c->release(c);
            std::free(c);
        }
    }
    std::free(s->children);
    if (s->dictionary) {
        if (s->dictionary->release) s->dictionary->release(s->dictionary);
        std::free(s->dictionary);
    }
    s->release = nullptr;
}

void cdata_release_array(CArrowArray* a) {
    if (!a || !a->release) return;
    for (int64_t i = 0; i < a->n_buffers; ++i)
        std::free((void*)a->buffers[i]);
    std::free(a->buffers);
    for (int64_t i = 0; i < a->n_children; ++i) {
        CArrowArray* c = a->children[i];
        if (c) {
            if (c->release) c->release(c);
            std::free(c);
        }
    }
    std::free(a->children);
    if (a->dictionary) {
        if (a->dictionary->release) a->dictionary->release(a->dictionary);
        std::free(a->dictionary);
    }
    a->release = nullptr;
}


// CSV row assembly: cells[c] is an n x widths[c] NUL-padded byte matrix
// (numpy S dtype); concatenates cell,delim,...,cell\n per row into out.
// Returns bytes written (caller sizes out at n*(sum(widths)+ncols)).
int64_t csv_join_rows(int64_t ncols, const uint8_t** cells,
                      const int64_t* widths, int64_t n, uint8_t delim,
                      uint8_t* out) {
    int64_t total = 0;
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t c = 0; c < ncols; ++c) {
            const int64_t w = widths[c];
            const uint8_t* s = cells[c] + i * w;
            int64_t len = 0;
            while (len < w && s[len]) ++len;
            std::memcpy(out + total, s, (size_t)len);
            total += len;
            out[total++] = (c + 1 < ncols) ? delim : (uint8_t)'\n';
        }
    }
    return total;
}


// Integer cell text: NUL-padded n x width S-matrix (itoa role).
void csv_format_i64(const int64_t* vals, int64_t n, int64_t width,
                    uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        uint8_t* dst = out + i * width;
        std::memset(dst, 0, (size_t)width);
        int64_t v = vals[i];
        uint64_t u = v < 0 ? (uint64_t)(-(v + 1)) + 1 : (uint64_t)v;
        uint8_t tmp[24];
        int k = 0;
        do { tmp[k++] = (uint8_t)('0' + u % 10); u /= 10; } while (u);
        int64_t p = 0;
        if (v < 0) dst[p++] = '-';
        while (k) dst[p++] = tmp[--k];
    }
}


// JSON line assembly: per-column NUL-padded S-matrices of
// '"name":value' fragments (empty cell = omitted field); emits
// {frag,frag,...}\n per row.  Returns bytes written.
int64_t json_join_rows(int64_t ncols, const uint8_t** cells,
                       const int64_t* widths, int64_t n, uint8_t* out) {
    int64_t total = 0;
    for (int64_t i = 0; i < n; ++i) {
        out[total++] = '{';
        bool first = true;
        for (int64_t c = 0; c < ncols; ++c) {
            const int64_t w = widths[c];
            const uint8_t* s = cells[c] + i * w;
            int64_t len = 0;
            while (len < w && s[len]) ++len;
            if (!len) continue;
            if (!first) out[total++] = ',';
            std::memcpy(out + total, s, (size_t)len);
            total += len;
            first = false;
        }
        out[total++] = '}';
        out[total++] = '\n';
    }
    return total;
}


// Timestamp cell text 'YYYY-MM-DDTHH:MM:SS[.f*]' (display.rs ISO form,
// np.datetime64-identical).  scale = ticks per second, frac = fraction
// digits; frac==-1 -> date-only cells ('YYYY-MM-DD', vals are DAYS).
void csv_format_timestamp(const int64_t* vals, int64_t n, int64_t scale,
                          int64_t frac, int64_t width, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        uint8_t* dst = out + i * width;
        std::memset(dst, 0, (size_t)width);
        int64_t days, rem = 0;
        if (frac < 0) {
            days = vals[i];
        } else {
            const int64_t per_day = scale * 86400;
            int64_t v = vals[i];
            days = v / per_day;
            rem = v % per_day;
            if (rem < 0) { rem += per_day; --days; }
        }
        // civil_from_days (Howard Hinnant's algorithm)
        int64_t z = days + 719468;
        const int64_t era = (z >= 0 ? z : z - 146096) / 146097;
        const int64_t doe = z - era * 146097;
        const int64_t yoe = (doe - doe / 1460 + doe / 36524
                             - doe / 146096) / 365;
        int64_t y = yoe + era * 400;
        const int64_t doy = doe - (365 * yoe + yoe / 4 - yoe / 100);
        const int64_t mp = (5 * doy + 2) / 153;
        const int64_t dd = doy - (153 * mp + 2) / 5 + 1;
        const int64_t mm = mp < 10 ? mp + 3 : mp - 9;
        if (mm <= 2) ++y;
        int64_t p = 0;
        if (y < 0) { dst[p++] = '-'; y = -y; }
        uint8_t yb[24]; int yk = 0;
        do { yb[yk++] = (uint8_t)('0' + y % 10); y /= 10; } while (y);
        while (yk < 4) yb[yk++] = '0';
        while (yk) dst[p++] = yb[--yk];
        dst[p++] = '-';
        dst[p++] = (uint8_t)('0' + mm / 10);
        dst[p++] = (uint8_t)('0' + mm % 10);
        dst[p++] = '-';
        dst[p++] = (uint8_t)('0' + dd / 10);
        dst[p++] = (uint8_t)('0' + dd % 10);
        if (frac < 0) continue;
        const int64_t secs = rem / scale;
        int64_t f = rem % scale;
        dst[p++] = 'T';
        dst[p++] = (uint8_t)('0' + secs / 36000);
        dst[p++] = (uint8_t)('0' + (secs / 3600) % 10);
        dst[p++] = ':';
        dst[p++] = (uint8_t)('0' + (secs % 3600) / 600);
        dst[p++] = (uint8_t)('0' + ((secs % 3600) / 60) % 10);
        dst[p++] = ':';
        dst[p++] = (uint8_t)('0' + (secs % 60) / 10);
        dst[p++] = (uint8_t)('0' + (secs % 60) % 10);
        if (frac > 0) {
            dst[p++] = '.';
            for (int64_t k = frac - 1; k >= 0; --k) {
                dst[p + k] = (uint8_t)('0' + f % 10);
                f /= 10;
            }
            p += frac;
        }
    }
}

}  // extern "C"

// ============================================================================
// regex engine: Thompson NFA compiled lazily to a byte DFA
// (arrow-string/src/regexp.rs:39 re-designed: the reference compiles a
// regex::Regex once and scans every value; here an ASCII-subset pattern
// compiles to an NFA whose lazily-built DFA scans all value bytes in one
// pass — one table lookup per byte, no per-row interpreter).
// Supported: literals, '.', [classes] with ranges/negation/escapes,
// \d\D\w\W\s\S, anchors ^ $, (groups) incl. (?:, alternation, * + ?
// {m,n} and lazy variants (laziness cannot change is_match). Anything
// else (backrefs, lookaround, \b, non-ASCII pattern bytes) makes
// regex_compile return NULL; the caller falls back to Python `re`.
// ============================================================================

#include <unordered_map>
#include <string>
#include <array>

namespace rex {

enum { I_CLS, I_SPLIT, I_JMP, I_MATCH, I_BOL, I_EOL };
struct Inst { int op; int cls; int x; int y; };
using Bits = std::array<uint64_t, 4>;

static inline bool bit(const Bits& b, uint8_t c) {
    return (b[c >> 6] >> (c & 63)) & 1;
}
static inline void setbit(Bits& b, uint8_t c) { b[c >> 6] |= 1ULL << (c & 63); }

struct Frag {
    int start = -1;                          // -1: epsilon fragment
    std::vector<std::pair<int, int>> outs;   // (inst idx, 0=x 1=y)
};

struct Parser {
    const uint8_t* p; const uint8_t* end; bool icase; bool ok = true;
    std::vector<Inst> ins;
    std::vector<Bits> classes;

    explicit Parser(const uint8_t* s, int64_t n, bool ic)
        : p(s), end(s + n), icase(ic) {}

    bool more() const { return p < end; }
    uint8_t peek() const { return *p; }
    void fail() { ok = false; p = end; }

    int emit(int op, int cls = 0, int x = -1, int y = -1) {
        if (ins.size() >= 4000) { fail(); return 0; }
        ins.push_back({op, cls, x, y});
        return (int)ins.size() - 1;
    }
    int addclass(const Bits& b) {
        classes.push_back(b);
        return (int)classes.size() - 1;
    }
    void patch(const std::vector<std::pair<int, int>>& outs, int target) {
        for (auto& o : outs)
            (o.second ? ins[o.first].y : ins[o.first].x) = target;
    }

    void fold(Bits& b) {   // case-insensitive: mirror ASCII letters
        for (int c = 'a'; c <= 'z'; ++c) {
            if (bit(b, (uint8_t)c)) setbit(b, (uint8_t)(c - 32));
            if (bit(b, (uint8_t)(c - 32))) setbit(b, (uint8_t)c);
        }
    }
    Bits single(uint8_t c) {
        Bits b{}; setbit(b, c);
        if (icase) fold(b);
        return b;
    }
    static Bits perl(uint8_t k) {
        Bits b{};
        switch (k) {
        case 'd': for (int c = '0'; c <= '9'; ++c) setbit(b, (uint8_t)c); break;
        case 'w':
            for (int c = '0'; c <= '9'; ++c) setbit(b, (uint8_t)c);
            for (int c = 'a'; c <= 'z'; ++c) setbit(b, (uint8_t)c);
            for (int c = 'A'; c <= 'Z'; ++c) setbit(b, (uint8_t)c);
            setbit(b, '_'); break;
        case 's': for (uint8_t c : {' ', '\t', '\n', '\r', '\f', '\v'})
                setbit(b, c); break;
        }
        return b;
    }
    static Bits negate(Bits b) {
        for (auto& w : b) w = ~w;
        return b;
    }

    // \-escape -> (is_class, bitmap) or literal byte; fails on backrefs etc.
    bool escape(Bits& out) {
        if (!more()) { fail(); return false; }
        uint8_t c = *p++;
        switch (c) {
        case 'd': out = perl('d'); return true;
        case 'D': out = negate(perl('d')); return true;
        case 'w': out = perl('w'); return true;
        case 'W': out = negate(perl('w')); return true;
        case 's': out = perl('s'); return true;
        case 'S': out = negate(perl('s')); return true;
        case 'n': out = single('\n'); return true;
        case 't': out = single('\t'); return true;
        case 'r': out = single('\r'); return true;
        case 'f': out = single('\f'); return true;
        case 'v': out = single('\v'); return true;
        case '0': out = single('\0'); return true;
        case 'x': {
            if (p + 2 > end || !isxdigit(p[0]) || !isxdigit(p[1])) {
                fail(); return false;
            }
            auto hx = [](uint8_t h) {
                return h <= '9' ? h - '0' : (h | 32) - 'a' + 10;
            };
            uint8_t v = (uint8_t)((hx(p[0]) << 4) | hx(p[1]));
            p += 2;
            out = single(v); return true;
        }
        default:
            if (isalnum(c)) { fail(); return false; }  // \b \A \1 ...
            out = single(c); return true;
        }
    }

    // [...] -> bitmap
    bool charclass(Bits& out) {
        Bits b{};
        bool neg = false;
        if (more() && peek() == '^') { neg = true; ++p; }
        bool first = true;
        while (more() && (peek() != ']' || first)) {
            first = false;
            Bits e{};
            uint8_t lo;
            bool is_class = false;
            if (peek() == '\\') {
                ++p;
                const uint8_t* before = p;
                if (!escape(e)) return false;
                // single-char escape? recover the byte for ranges
                is_class = (before < end) && strchr("dDwWsS", before[0]);
                if (!is_class) {
                    lo = 0;
                    for (int c = 0; c < 256; ++c)
                        if (bit(e, (uint8_t)c)) { lo = (uint8_t)c; break; }
                }
            } else {
                lo = *p++;
                if (lo >= 0x80) { fail(); return false; }
                e = single(lo);
            }
            if (!is_class && more() && peek() == '-' && p + 1 < end
                && p[1] != ']') {
                ++p;
                uint8_t hi;
                if (peek() == '\\') {
                    ++p;
                    Bits h{};
                    if (!escape(h)) return false;
                    hi = 0;
                    for (int c = 255; c >= 0; --c)
                        if (bit(h, (uint8_t)c)) { hi = (uint8_t)c; break; }
                } else {
                    hi = *p++;
                    if (hi >= 0x80) { fail(); return false; }
                }
                if (hi < lo) { fail(); return false; }
                for (int c = lo; c <= hi; ++c) setbit(e, (uint8_t)c);
                if (icase) fold(e);
            }
            for (int i = 0; i < 4; ++i) b[i] |= e[i];
        }
        if (!more()) { fail(); return false; }
        ++p;  // ']'
        if (neg) b = negate(b);
        out = b;
        return true;
    }

    Frag cls_frag(const Bits& b) {
        int i = emit(I_CLS, addclass(b));
        return {i, {{i, 0}}};
    }

    // quantifier duplication: copy [lo, hi) instructions; internal
    // targets shift by delta, pending (-1) stay pending
    Frag copy_range(int lo, int hi, const Frag& f) {
        int delta = (int)ins.size() - lo;
        if (ins.size() + (hi - lo) > 4000) { fail(); return {}; }
        for (int i = lo; i < hi; ++i) {
            Inst c = ins[i];
            if (c.x >= lo && c.x < hi) c.x += delta;
            if (c.y >= lo && c.y < hi) c.y += delta;
            ins.push_back(c);
        }
        Frag g;
        g.start = f.start + delta;
        for (auto& o : f.outs) g.outs.push_back({o.first + delta, o.second});
        return g;
    }

    Frag concat(Frag a, Frag b) {
        if (a.start < 0) return b;
        if (b.start < 0) return a;
        patch(a.outs, b.start);
        return {a.start, b.outs};
    }

    // {m,n} on the atom occupying [lo, end) with fragment f
    Frag repeat_range(Frag f, int lo_i, int m, int n) {
        int hi_i = (int)ins.size();
        if (f.start < 0) return f;
        Frag out;                                  // epsilon
        for (int k = 0; k < m; ++k)
            out = concat(out, k == 0 ? f : copy_range(lo_i, hi_i, f));
        if (n < 0) {                               // {m,}
            if (m == 0) return star(f);
            Frag last = copy_range(lo_i, hi_i, f);
            int s = emit(I_SPLIT, 0, last.start, -1);
            patch(last.outs, s);
            Frag plus{last.start, {{s, 1}}};
            // optional: allow skipping the +-tail entirely when m copies
            int s2 = emit(I_SPLIT, 0, plus.start, -1);
            Frag opt{s2, plus.outs};
            opt.outs.push_back({s2, 1});
            return concat(out, opt);
        }
        for (int k = m; k < n; ++k) {              // optional copies
            // a{m,n} = a^m (a)?^(n-m): same language as nested optionals
            Frag c = (k == 0) ? f : copy_range(lo_i, hi_i, f);
            int s = emit(I_SPLIT, 0, c.start, -1);
            Frag opt{s, c.outs};
            opt.outs.push_back({s, 1});
            out = concat(out, opt);
        }
        return out;                                // epsilon when {0,0}
    }

    Frag star(Frag f) {
        int s = emit(I_SPLIT, 0, f.start, -1);
        patch(f.outs, s);
        return {s, {{s, 1}}};
    }

    Frag parse_atom() {
        if (!more()) { fail(); return {}; }
        uint8_t c = *p++;
        if (c >= 0x80) { fail(); return {}; }
        switch (c) {
        case '(': {
            if (more() && peek() == '?') {
                if (p + 1 < end && p[1] == ':') p += 2;
                else { fail(); return {}; }       // lookaround / flags
            }
            Frag f = parse_alt();
            if (!more() || *p++ != ')') { fail(); return {}; }
            return f;
        }
        case '[': {
            Bits b{};
            if (!charclass(b)) return {};
            return cls_frag(b);
        }
        case '.': {
            Bits b = negate(single('\n'));
            if (icase) {}                          // '.' unaffected
            // single('\n') folded nothing; negate gives all-but-\n
            return cls_frag(b);
        }
        case '^': {
            int i = emit(I_BOL);
            return {i, {{i, 0}}};
        }
        case '$': {
            int i = emit(I_EOL);
            return {i, {{i, 0}}};
        }
        case '\\': {
            Bits b{};
            if (!escape(b)) return {};
            return cls_frag(b);
        }
        case '*': case '+': case '?': fail(); return {};
        case ')': case '|': --p; fail(); return {};
        default:
            return cls_frag(single(c));
        }
    }

    Frag parse_piece() {
        int lo_i = (int)ins.size();
        Frag f = parse_atom();
        if (!ok) return {};
        for (;;) {
            if (!more()) break;
            uint8_t c = peek();
            if (c == '*' || c == '+' || c == '?') {
                ++p;
                if (more() && peek() == '+') {      // possessive: atomic
                    fail(); return {};              // semantics unsupported
                }
                if (more() && peek() == '?') ++p;   // lazy: same language
                int hi_i = (int)ins.size();
                if (c == '*') f = star(f);
                else if (c == '+') {
                    int s = emit(I_SPLIT, 0, f.start, -1);
                    patch(f.outs, s);
                    f = {f.start, {{s, 1}}};
                } else {
                    int s = emit(I_SPLIT, 0, f.start, -1);
                    Frag g{s, f.outs};
                    g.outs.push_back({s, 1});
                    f = g;
                }
                (void)hi_i;
                lo_i = (int)ins.size();             // no further {m,n} copying of modified atom
            } else if (c == '{') {
                // parse {m} {m,} {m,n}; otherwise literal '{'
                const uint8_t* save = p;
                ++p;
                int m = -1, n = -2;
                if (more() && isdigit(peek())) {
                    m = 0;
                    while (more() && isdigit(peek())) {
                        m = m * 10 + (*p++ - '0');
                        if (m > 1000) { fail(); return {}; }
                    }
                    if (more() && peek() == '}') { ++p; n = m; }
                    else if (more() && peek() == ',') {
                        ++p;
                        if (more() && peek() == '}') { ++p; n = -1; }
                        else {
                            n = 0;
                            while (more() && isdigit(peek())) {
                                n = n * 10 + (*p++ - '0');
                                if (n > 1000) { fail(); return {}; }
                            }
                            if (!more() || *p++ != '}') { p = save; m = -1; }
                        }
                    } else { p = save; m = -1; }
                } else { p = save; }
                if (m < 0) {                        // literal '{'
                    p0_literal_brace = true;        // parse_cat consumes it
                    return f;
                }
                if (n != -1 && n < m) { fail(); return {}; }
                if (more() && peek() == '+') { fail(); return {}; }
                if (more() && peek() == '?') ++p;   // lazy
                f = repeat_range(f, lo_i, m, n);
                if (!ok) return {};
                lo_i = (int)ins.size();
            } else break;
        }
        return f;
    }

    bool p0_literal_brace = false;

    Frag parse_cat() {
        Frag f;                                     // epsilon
        while (more() && peek() != '|' && peek() != ')') {
            if (p0_literal_brace) {
                p0_literal_brace = false;
                ++p;                                // consume '{'
                f = concat(f, cls_frag(single('{')));
                continue;
            }
            Frag g = parse_piece();
            if (!ok) return {};
            f = concat(f, g);
        }
        return f;
    }

    Frag parse_alt() {
        Frag f = parse_cat();
        if (!ok) return {};
        while (more() && peek() == '|') {
            ++p;
            Frag g = parse_cat();
            if (!ok) return {};
            if (f.start < 0 && g.start < 0) continue;
            if (f.start < 0) {                      // (|a): a optional
                int s = emit(I_SPLIT, 0, g.start, -1);
                Frag h{s, g.outs};
                h.outs.push_back({s, 1});
                f = h;
                continue;
            }
            if (g.start < 0) {
                int s = emit(I_SPLIT, 0, f.start, -1);
                Frag h{s, f.outs};
                h.outs.push_back({s, 1});
                f = h;
                continue;
            }
            int s = emit(I_SPLIT, 0, f.start, g.start);
            Frag h{s, f.outs};
            for (auto& o : g.outs) h.outs.push_back(o);
            f = h;
        }
        return f;
    }
};

struct DState {
    std::vector<int> pcs;      // CLS pcs (transition basis)
    std::vector<int> raw;      // pre-closure key set
    int trans[256];
    bool match_now, match_end;
};

struct Re {
    std::vector<Inst> ins;
    std::vector<Bits> classes;
    std::vector<DState> states;
    std::unordered_map<std::string, int> map;
    int start = -1;
    bool accept_empty = false;
    bool dfa_dead = false;
    std::vector<uint8_t> seen;                 // closure scratch

    // epsilon closure of `raw`; collects CLS pcs, reports MATCH
    void closure(const std::vector<int>& raw, bool bol, bool eol,
                 std::vector<int>& out, bool* match) {
        std::fill(seen.begin(), seen.end(), 0);
        out.clear();
        *match = false;
        std::vector<int> stk(raw);
        while (!stk.empty()) {
            int pc = stk.back(); stk.pop_back();
            if (pc < 0 || pc >= (int)ins.size() || seen[pc]) continue;
            seen[pc] = 1;
            const Inst& I = ins[pc];
            switch (I.op) {
            case I_CLS: out.push_back(pc); break;
            case I_MATCH: *match = true; break;
            case I_SPLIT: stk.push_back(I.x); stk.push_back(I.y); break;
            case I_JMP: stk.push_back(I.x); break;
            case I_BOL: if (bol) stk.push_back(I.x); break;
            case I_EOL: if (eol) stk.push_back(I.x); break;
            }
        }
        std::sort(out.begin(), out.end());
    }

    static std::string key(const std::vector<int>& v) {
        return std::string((const char*)v.data(), v.size() * sizeof(int));
    }

    int make_state(std::vector<int> raw, bool bol) {
        std::sort(raw.begin(), raw.end());
        raw.erase(std::unique(raw.begin(), raw.end()), raw.end());
        std::string k = key(raw);
        if (bol) k.push_back('^');
        auto it = map.find(k);
        if (it != map.end()) return it->second;
        DState st;
        st.raw = raw;
        closure(raw, bol, false, st.pcs, &st.match_now);
        std::vector<int> tmp;
        bool me;
        closure(raw, bol, true, tmp, &me);
        st.match_end = me;
        std::fill(st.trans, st.trans + 256, -1);
        states.push_back(std::move(st));
        int id = (int)states.size() - 1;
        map.emplace(std::move(k), id);
        return id;
    }

    int step(int sid, uint8_t c) {
        std::vector<int> moved;
        for (int pc : states[sid].pcs)
            if (bit(classes[ins[pc].cls], c))
                moved.push_back(ins[pc].x);
        moved.push_back(0);                    // unanchored re-injection
        return make_state(std::move(moved), false);
    }

    bool search(const uint8_t* s, int64_t len) {
        if (len == 0) return accept_empty;
        if (!dfa_dead && states.size() > 8192) dfa_dead = true;
        if (dfa_dead) return nfa_search(s, len);
        int st = start;
        for (int64_t i = 0; i < len; ++i) {
            DState& S = states[st];
            if (S.match_now) return true;
            int t = S.trans[s[i]];
            if (t < 0) {
                t = step(st, s[i]);
                states[st].trans[s[i]] = t;
                if (states.size() > 8192) {    // cap blown mid-string
                    dfa_dead = true;
                    return nfa_search(s, len);
                }
            }
            st = t;
        }
        return states[st].match_now || states[st].match_end;
    }

    bool nfa_search(const uint8_t* s, int64_t len) {
        std::vector<int> raw{0}, pcs, moved;
        bool m;
        closure(raw, true, len == 0, pcs, &m);
        if (m) return true;
        for (int64_t i = 0; i < len; ++i) {
            moved.clear();
            for (int pc : pcs)
                if (bit(classes[ins[pc].cls], s[i]))
                    moved.push_back(ins[pc].x);
            moved.push_back(0);
            closure(moved, false, i + 1 == len, pcs, &m);
            if (m) return true;
        }
        return false;
    }
};

}  // namespace rex

extern "C" {

void* regex_compile(const uint8_t* pat, int64_t plen, int32_t icase) {
    for (int64_t i = 0; i < plen; ++i)
        if (pat[i] >= 0x80) return nullptr;
    rex::Parser P(pat, plen, icase != 0);
    rex::Frag f = P.parse_alt();
    if (!P.ok || P.more()) return nullptr;
    int m = P.emit(rex::I_MATCH);
    if (!P.ok) return nullptr;
    if (f.start < 0) f.start = m;              // empty pattern
    else P.patch(f.outs, m);
    // entry jump so pc 0 is the program start
    rex::Re* re = new rex::Re();
    re->ins.reserve(P.ins.size() + 1);
    re->ins.push_back({rex::I_JMP, 0, f.start + 1, -1});
    for (auto& I : P.ins) {
        rex::Inst c = I;
        if (c.x >= 0) c.x += 1;
        if (c.y >= 0) c.y += 1;
        re->ins.push_back(c);
    }
    re->classes = P.classes;
    re->seen.assign(re->ins.size(), 0);
    std::vector<int> tmp;
    bool me;
    re->closure({0}, true, true, tmp, &me);
    re->accept_empty = me;
    re->start = re->make_state({0}, true);
    return re;
}

void regex_free(void* h) { delete (rex::Re*)h; }

void regex_match_batch(void* h, const int64_t* offs, const uint8_t* data,
                       int64_t n, uint8_t* out) {
    rex::Re* re = (rex::Re*)h;
    for (int64_t i = 0; i < n; ++i)
        out[i] = re->search(data + offs[i], offs[i + 1] - offs[i]) ? 1 : 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Avro columnar block decoder (the arrow-avro decode hot path,
// arrow-avro/src/reader/record.rs role).  Python compiles the Avro
// schema into a flat node program; this decoder walks each row once and
// appends values into per-node columnar buffers (values / varlen bytes +
// lengths / per-occurrence child counts / union valid flags), which the
// Python side assembles into Arrow columns with vectorized numpy ops.
// Two-pass protocol: fill=0 measures per-node occurrence and byte counts
// (occ / nbytes outputs), fill=1 writes into caller-allocated buffers.
//
// Node kinds:
//   0 null  1 boolean  2 int/long (zigzag varint -> i64)
//   3 float (f32 -> f64 out)  4 double  5 string/bytes (varlen)
//   6 fixed (extra = byte width)  7 enum (varint -> i64)
//   8 record (children in order)  9 array (1 child)
//   10 map (2 children: key string node, value node)
//   11 nullable union (extra = null branch index, 1 child; emits a
//      u8 valid flag per occurrence)
// ---------------------------------------------------------------------------

namespace avro {

struct Ctx {
    const uint8_t* d;
    int64_t len;
    int64_t pos;
    const uint8_t* kind;
    const int32_t* extra;
    const int32_t* cstart;
    const int32_t* ccount;
    const int32_t* cidx;
    int fill;
    int64_t* occ;      // per-node occurrence cursor / count
    int64_t* bytec;    // per-node varlen byte cursor / count
    void** vals;
    void** lens;
};

static inline int zz(Ctx* c, int64_t* out) {
    uint64_t acc = 0;
    int shift = 0;
    for (;;) {
        if (c->pos >= c->len || shift > 63) return -1;
        uint8_t b = c->d[c->pos++];
        acc |= (uint64_t)(b & 0x7F) << shift;
        if (!(b & 0x80)) break;
        shift += 7;
    }
    *out = (int64_t)(acc >> 1) ^ -(int64_t)(acc & 1);
    return 0;
}

static int dec(Ctx* c, int32_t node) {
    const int64_t o = c->occ[node];
    switch (c->kind[node]) {
    case 0:  // null
        return 0;
    case 1: {  // boolean
        if (c->pos >= c->len) return -1;
        if (c->fill) ((uint8_t*)c->vals[node])[o] = c->d[c->pos] != 0;
        c->pos++; c->occ[node]++;
        return 0;
    }
    case 2: case 7: {  // int/long/enum
        int64_t v;
        if (zz(c, &v)) return -1;
        if (c->fill) ((int64_t*)c->vals[node])[o] = v;
        c->occ[node]++;
        return 0;
    }
    case 3: {  // float -> f64
        if (c->pos + 4 > c->len) return -1;
        if (c->fill) {
            float f;
            memcpy(&f, c->d + c->pos, 4);
            ((double*)c->vals[node])[o] = (double)f;
        }
        c->pos += 4; c->occ[node]++;
        return 0;
    }
    case 4: {  // double
        if (c->pos + 8 > c->len) return -1;
        if (c->fill) {
            double f;
            memcpy(&f, c->d + c->pos, 8);
            ((double*)c->vals[node])[o] = f;
        }
        c->pos += 8; c->occ[node]++;
        return 0;
    }
    case 5: {  // string/bytes
        int64_t n;
        if (zz(c, &n) || n < 0 || c->pos + n > c->len) return -1;
        if (c->fill) {
            memcpy((uint8_t*)c->vals[node] + c->bytec[node],
                   c->d + c->pos, (size_t)n);
            ((int64_t*)c->lens[node])[o] = n;
        }
        c->pos += n; c->bytec[node] += n; c->occ[node]++;
        return 0;
    }
    case 6: {  // fixed
        const int64_t w = c->extra[node];
        if (c->pos + w > c->len) return -1;
        if (c->fill)
            memcpy((uint8_t*)c->vals[node] + o * w, c->d + c->pos,
                   (size_t)w);
        c->pos += w; c->occ[node]++;
        return 0;
    }
    case 8: {  // record
        const int32_t s = c->cstart[node];
        for (int32_t k = 0; k < c->ccount[node]; ++k)
            if (dec(c, c->cidx[s + k])) return -1;
        return 0;
    }
    case 9: {  // array
        const int32_t child = c->cidx[c->cstart[node]];
        int64_t total = 0;
        for (;;) {
            int64_t n;
            if (zz(c, &n)) return -1;
            if (n == 0) break;
            if (n < 0) {
                int64_t sz;
                if (zz(c, &sz)) return -1;  // block byte size (skippable)
                n = -n;
            }
            if (n > (int64_t)1 << 40) return -1;
            total += n;
            for (int64_t k = 0; k < n; ++k)
                if (dec(c, child)) return -1;
        }
        if (c->fill) ((int64_t*)c->vals[node])[o] = total;
        c->occ[node]++;
        return 0;
    }
    case 10: {  // map: entries decode key then value
        const int32_t s = c->cstart[node];
        const int32_t knode = c->cidx[s], vnode = c->cidx[s + 1];
        int64_t total = 0;
        for (;;) {
            int64_t n;
            if (zz(c, &n)) return -1;
            if (n == 0) break;
            if (n < 0) {
                int64_t sz;
                if (zz(c, &sz)) return -1;
                n = -n;
            }
            if (n > (int64_t)1 << 40) return -1;
            total += n;
            for (int64_t k = 0; k < n; ++k) {
                if (dec(c, knode)) return -1;
                if (dec(c, vnode)) return -1;
            }
        }
        if (c->fill) ((int64_t*)c->vals[node])[o] = total;
        c->occ[node]++;
        return 0;
    }
    case 11: {  // nullable union
        int64_t branch;
        if (zz(c, &branch)) return -1;
        const int valid = branch != c->extra[node];
        if (c->fill) ((uint8_t*)c->vals[node])[o] = (uint8_t)valid;
        c->occ[node]++;
        if (valid) return dec(c, c->cidx[c->cstart[node]]);
        return 0;
    }
    default:
        return -1;
    }
}

}  // namespace avro

extern "C" {

int64_t avro_decode_block(const uint8_t* data, int64_t len,
                          int64_t row_count,
                          const uint8_t* kind, const int32_t* extra,
                          const int32_t* child_start,
                          const int32_t* child_count,
                          const int32_t* child_idx,
                          int32_t n_nodes, int32_t root, int32_t fill,
                          int64_t* occ, int64_t* nbytes,
                          void** vals, void** lens) {
    avro::Ctx c{data, len, 0, kind, extra, child_start, child_count,
                child_idx, fill, occ, nbytes, vals, lens};
    for (int32_t i = 0; i < n_nodes; ++i) { occ[i] = 0; nbytes[i] = 0; }
    for (int64_t r = 0; r < row_count; ++r)
        if (avro::dec(&c, root)) return -1;
    return c.pos;
}

}  // extern "C"
