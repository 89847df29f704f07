// Native host-side codecs for rabitq_tpu.
//
// The device compute path is JAX/XLA; these are the framework's native
// runtime pieces for index save/load and format interop — the moral
// equivalent of the reference's Rust codec layer (lqhl/rabitq-rs
// src/simd.rs bit pack/unpack, pack_codes) re-implemented in C++:
//
//   * binary code packing, MSB-first per byte        (simd.rs:141-163)
//   * generic LSB-first ex-code bitstream            (simd.rs:166-223)
//   * C++-compatible interleaved 2/6-bit ex packing  (simd.rs:2478-2695)
//   * FastScan 32-row KPERM0 batch transpose         (simd.rs:864-960)
//   * CRC32 (IEEE, zlib-compatible) streaming digest
//
// Built as a plain shared library with a C ABI (see Makefile); loaded via
// ctypes (rabitq_tpu/native.py). numpy implementations in
// rabitq_tpu/ops/packing.py remain the fallback and the test oracle.

#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// binary codes (MSB-first within each byte)
// ---------------------------------------------------------------------------

void rbq_pack_binary(const uint8_t* bits, size_t n, size_t dim, uint8_t* out) {
    const size_t out_bytes = (dim + 7) / 8;
    for (size_t r = 0; r < n; ++r) {
        const uint8_t* row = bits + r * dim;
        uint8_t* dst = out + r * out_bytes;
        std::memset(dst, 0, out_bytes);
        for (size_t i = 0; i < dim; ++i) {
            if (row[i]) dst[i >> 3] |= static_cast<uint8_t>(1u << (7 - (i & 7)));
        }
    }
}

void rbq_unpack_binary(const uint8_t* packed, size_t n, size_t dim, uint8_t* out) {
    const size_t in_bytes = (dim + 7) / 8;
    for (size_t r = 0; r < n; ++r) {
        const uint8_t* src = packed + r * in_bytes;
        uint8_t* row = out + r * dim;
        for (size_t i = 0; i < dim; ++i) {
            row[i] = (src[i >> 3] >> (7 - (i & 7))) & 1u;
        }
    }
}

// ---------------------------------------------------------------------------
// generic ex-codes: LSB-first bitstream, ex_bits per element
// ---------------------------------------------------------------------------

void rbq_pack_ex_generic(const uint16_t* ex, size_t n, size_t dim, int ex_bits,
                         uint8_t* out) {
    const size_t out_bytes = (dim * static_cast<size_t>(ex_bits) + 7) / 8;
    for (size_t r = 0; r < n; ++r) {
        const uint16_t* row = ex + r * dim;
        uint8_t* dst = out + r * out_bytes;
        std::memset(dst, 0, out_bytes);
        size_t bitpos = 0;
        for (size_t i = 0; i < dim; ++i, bitpos += ex_bits) {
            uint32_t code = row[i] & ((1u << ex_bits) - 1u);
            size_t byte = bitpos >> 3;
            int shift = static_cast<int>(bitpos & 7);
            uint32_t v = code << shift;
            dst[byte] |= static_cast<uint8_t>(v);
            if (shift + ex_bits > 8) dst[byte + 1] |= static_cast<uint8_t>(v >> 8);
            if (shift + ex_bits > 16) dst[byte + 2] |= static_cast<uint8_t>(v >> 16);
        }
    }
}

void rbq_unpack_ex_generic(const uint8_t* packed, size_t n, size_t dim, int ex_bits,
                           uint16_t* out) {
    const size_t in_bytes = (dim * static_cast<size_t>(ex_bits) + 7) / 8;
    const uint32_t mask = (1u << ex_bits) - 1u;
    for (size_t r = 0; r < n; ++r) {
        const uint8_t* src = packed + r * in_bytes;
        uint16_t* row = out + r * dim;
        size_t bitpos = 0;
        for (size_t i = 0; i < dim; ++i, bitpos += ex_bits) {
            size_t byte = bitpos >> 3;
            int shift = static_cast<int>(bitpos & 7);
            uint32_t v = src[byte];
            if (shift + ex_bits > 8) v |= static_cast<uint32_t>(src[byte + 1]) << 8;
            if (shift + ex_bits > 16) v |= static_cast<uint32_t>(src[byte + 2]) << 16;
            row[i] = static_cast<uint16_t>((v >> shift) & mask);
        }
    }
}

// ---------------------------------------------------------------------------
// C++-compatible interleaved packings (groups of 16 dims)
// ---------------------------------------------------------------------------

void rbq_pack_ex_2bit(const uint16_t* ex, size_t n, size_t dim, uint8_t* out) {
    const size_t groups = dim / 16;
    for (size_t r = 0; r < n; ++r) {
        const uint16_t* row = ex + r * dim;
        uint8_t* dst = out + r * groups * 4;
        for (size_t g = 0; g < groups; ++g) {
            const uint16_t* c = row + g * 16;
            for (int j = 0; j < 4; ++j) {
                dst[g * 4 + j] = static_cast<uint8_t>(
                    (c[j] & 3) | ((c[4 + j] & 3) << 2) | ((c[8 + j] & 3) << 4) |
                    ((c[12 + j] & 3) << 6));
            }
        }
    }
}

void rbq_unpack_ex_2bit(const uint8_t* packed, size_t n, size_t dim, uint16_t* out) {
    const size_t groups = dim / 16;
    for (size_t r = 0; r < n; ++r) {
        const uint8_t* src = packed + r * groups * 4;
        uint16_t* row = out + r * dim;
        for (size_t g = 0; g < groups; ++g) {
            uint16_t* c = row + g * 16;
            for (int j = 0; j < 4; ++j) {
                uint8_t b = src[g * 4 + j];
                c[j] = b & 3;
                c[4 + j] = (b >> 2) & 3;
                c[8 + j] = (b >> 4) & 3;
                c[12 + j] = (b >> 6) & 3;
            }
        }
    }
}

void rbq_pack_ex_6bit(const uint16_t* ex, size_t n, size_t dim, uint8_t* out) {
    const size_t groups = dim / 16;
    for (size_t r = 0; r < n; ++r) {
        const uint16_t* row = ex + r * dim;
        uint8_t* dst = out + r * groups * 12;
        for (size_t g = 0; g < groups; ++g) {
            const uint16_t* c = row + g * 16;
            uint8_t* d = dst + g * 12;
            for (int i = 0; i < 8; ++i) {
                d[i] = static_cast<uint8_t>((c[i] & 0x0F) | ((c[8 + i] & 0x0F) << 4));
            }
            for (int j = 0; j < 4; ++j) {
                d[8 + j] = static_cast<uint8_t>(
                    (((c[j] >> 4) & 3)) | (((c[4 + j] >> 4) & 3) << 2) |
                    (((c[8 + j] >> 4) & 3) << 4) | (((c[12 + j] >> 4) & 3) << 6));
            }
        }
    }
}

void rbq_unpack_ex_6bit(const uint8_t* packed, size_t n, size_t dim, uint16_t* out) {
    const size_t groups = dim / 16;
    for (size_t r = 0; r < n; ++r) {
        const uint8_t* src = packed + r * groups * 12;
        uint16_t* row = out + r * dim;
        for (size_t g = 0; g < groups; ++g) {
            const uint8_t* d = src + g * 12;
            uint16_t* c = row + g * 16;
            for (int i = 0; i < 8; ++i) {
                c[i] = d[i] & 0x0F;
                c[8 + i] = (d[i] >> 4) & 0x0F;
            }
            for (int j = 0; j < 4; ++j) {
                uint8_t b = d[8 + j];
                c[j] |= static_cast<uint16_t>((b & 3) << 4);
                c[4 + j] |= static_cast<uint16_t>(((b >> 2) & 3) << 4);
                c[8 + j] |= static_cast<uint16_t>(((b >> 4) & 3) << 4);
                c[12 + j] |= static_cast<uint16_t>(((b >> 6) & 3) << 4);
            }
        }
    }
}

// ---------------------------------------------------------------------------
// FastScan 32-row batch transpose with KPERM0
// ---------------------------------------------------------------------------

static const int KPERM0[16] = {0, 8, 1, 9, 2, 10, 3, 11, 4, 12, 5, 13, 6, 14, 7, 15};

// rows: [num_batches, 32, dim_bytes] -> out: [num_batches, dim_bytes * 32]
void rbq_pack_codes(const uint8_t* rows, size_t num_batches, size_t dim_bytes,
                    uint8_t* out) {
    for (size_t b = 0; b < num_batches; ++b) {
        const uint8_t* batch = rows + b * 32 * dim_bytes;
        uint8_t* dst = out + b * dim_bytes * 32;
        for (size_t col = 0; col < dim_bytes; ++col) {
            uint8_t c0[32], c1[32];
            for (int v = 0; v < 32; ++v) {
                uint8_t byte = batch[static_cast<size_t>(v) * dim_bytes + col];
                c0[v] = byte >> 4;
                c1[v] = byte & 15;
            }
            uint8_t* o = dst + col * 32;
            for (int j = 0; j < 16; ++j) {
                o[j] = static_cast<uint8_t>(c0[KPERM0[j]] | (c0[KPERM0[j] + 16] << 4));
                o[16 + j] = static_cast<uint8_t>(c1[KPERM0[j]] | (c1[KPERM0[j] + 16] << 4));
            }
        }
    }
}

// packed: [num_batches, dim_bytes * 32] -> out: [num_batches, 32, dim_bytes]
void rbq_unpack_codes(const uint8_t* packed, size_t num_batches, size_t dim_bytes,
                      uint8_t* out) {
    for (size_t b = 0; b < num_batches; ++b) {
        const uint8_t* src = packed + b * dim_bytes * 32;
        uint8_t* batch = out + b * 32 * dim_bytes;
        for (size_t col = 0; col < dim_bytes; ++col) {
            const uint8_t* i = src + col * 32;
            uint8_t c0[32], c1[32];
            for (int j = 0; j < 16; ++j) {
                c0[KPERM0[j]] = i[j] & 15;
                c0[KPERM0[j] + 16] = i[j] >> 4;
                c1[KPERM0[j]] = i[16 + j] & 15;
                c1[KPERM0[j] + 16] = i[16 + j] >> 4;
            }
            for (int v = 0; v < 32; ++v) {
                batch[static_cast<size_t>(v) * dim_bytes + col] =
                    static_cast<uint8_t>((c0[v] << 4) | c1[v]);
            }
        }
    }
}

// ---------------------------------------------------------------------------
// CRC32 (IEEE 802.3 polynomial, zlib/crc32fast compatible)
// ---------------------------------------------------------------------------

static uint32_t crc_table[256];
static bool crc_table_ready = false;

static void crc_init() {
    for (uint32_t i = 0; i < 256; ++i) {
        uint32_t c = i;
        for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc_table[i] = c;
    }
    crc_table_ready = true;
}

uint32_t rbq_crc32(uint32_t crc, const uint8_t* data, size_t len) {
    if (!crc_table_ready) crc_init();
    crc ^= 0xFFFFFFFFu;
    for (size_t i = 0; i < len; ++i)
        crc = crc_table[(crc ^ data[i]) & 0xFFu] ^ (crc >> 8);
    return crc ^ 0xFFFFFFFFu;
}

int rbq_native_abi_version() { return 1; }

}  // extern "C"
