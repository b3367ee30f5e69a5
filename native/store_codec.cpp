// Native store codec: batched .clp framing on libzstd.
//
// The reference's only native capability is zstd through the `zstandard`
// python binding (reference io/bitstream.py:10,19,32 — SURVEY.md §2.4). This
// engine keeps the frame format byte-identical (magic "CLPF" + <I compressed
// length + zstd level-22 payload) while giving the store writer/reader a
// batch path: one reused ZSTD_CCtx/DCtx across vectors instead of a fresh
// python-level compressor per record (context setup dominates at level 22
// for few-hundred-byte payloads).
//
// Build: `make -C native` (produces libstore_codec.so, loaded via ctypes by
// clip_codec_tpu/io/native.py; the python zstandard path remains the
// fallback so the package works without the native build).

#include <zstd.h>

#include <cstdint>
#include <cstring>

namespace {

constexpr char kMagic[4] = {'C', 'L', 'P', 'F'};
constexpr int kLevel = 22;

inline void put_le32(uint8_t* p, uint32_t v) {
  p[0] = v & 0xff;
  p[1] = (v >> 8) & 0xff;
  p[2] = (v >> 16) & 0xff;
  p[3] = (v >> 24) & 0xff;
}

inline uint32_t get_le32(const uint8_t* p) {
  return uint32_t(p[0]) | (uint32_t(p[1]) << 8) | (uint32_t(p[2]) << 16) |
         (uint32_t(p[3]) << 24);
}

}  // namespace

extern "C" {

// Upper bound on one framed record for payloads of `n` bytes.
size_t clp_frame_bound(size_t n) { return 8 + ZSTD_compressBound(n); }

// Frame one payload. Returns total frame size or 0 on error.
size_t clp_compress_frame(const uint8_t* in, size_t n, uint8_t* out,
                          size_t out_cap, int level) {
  if (out_cap < 8) return 0;
  size_t c = ZSTD_compress(out + 8, out_cap - 8, in, n,
                           level > 0 ? level : kLevel);
  if (ZSTD_isError(c)) return 0;
  std::memcpy(out, kMagic, 4);
  put_le32(out + 4, static_cast<uint32_t>(c));
  return 8 + c;
}

// Parse one framed record. Returns decoded payload size or 0 on error
// (bad magic, truncation, corrupt payload, output too small).
size_t clp_decompress_frame(const uint8_t* in, size_t n, uint8_t* out,
                            size_t out_cap) {
  if (n < 8 || std::memcmp(in, kMagic, 4) != 0) return 0;
  uint32_t c = get_le32(in + 4);
  if (8 + size_t(c) > n) return 0;
  size_t d = ZSTD_decompress(out, out_cap, in + 8, c);
  if (ZSTD_isError(d)) return 0;
  return d;
}

// Batched framing: `count` vectors of `dim` bytes each (contiguous in `in`).
// Frames are written back-to-back into `out`; `offsets[i]`/`sizes[i]` receive
// each frame's position. Reuses one ZSTD_CCtx. Returns total bytes written,
// 0 on error.
size_t clp_compress_batch(const uint8_t* in, size_t count, size_t dim,
                          uint8_t* out, size_t out_cap, size_t* offsets,
                          size_t* sizes, int level) {
  ZSTD_CCtx* ctx = ZSTD_createCCtx();
  if (!ctx) return 0;
  size_t pos = 0;
  for (size_t i = 0; i < count; ++i) {
    if (pos + 8 > out_cap) {
      ZSTD_freeCCtx(ctx);
      return 0;
    }
    size_t c = ZSTD_compressCCtx(ctx, out + pos + 8, out_cap - pos - 8,
                                 in + i * dim, dim, level > 0 ? level : kLevel);
    if (ZSTD_isError(c)) {
      ZSTD_freeCCtx(ctx);
      return 0;
    }
    std::memcpy(out + pos, kMagic, 4);
    put_le32(out + pos + 4, static_cast<uint32_t>(c));
    offsets[i] = pos;
    sizes[i] = 8 + c;
    pos += 8 + c;
  }
  ZSTD_freeCCtx(ctx);
  return pos;
}

// Batched parse of `count` frames located at offsets[i] (sizes[i] bytes) in
// `in`, each decoding to exactly `dim` bytes written at out + i*dim.
// Returns count on success, the index of the first failing record otherwise.
size_t clp_decompress_batch(const uint8_t* in, const size_t* offsets,
                            const size_t* sizes, size_t count, size_t dim,
                            uint8_t* out) {
  ZSTD_DCtx* ctx = ZSTD_createDCtx();
  if (!ctx) return 0;
  for (size_t i = 0; i < count; ++i) {
    const uint8_t* rec = in + offsets[i];
    size_t n = sizes[i];
    if (n < 8 || std::memcmp(rec, kMagic, 4) != 0) {
      ZSTD_freeDCtx(ctx);
      return i;
    }
    uint32_t c = get_le32(rec + 4);
    if (8 + size_t(c) > n) {
      ZSTD_freeDCtx(ctx);
      return i;
    }
    size_t d = ZSTD_decompressDCtx(ctx, out + i * dim, dim, rec + 8, c);
    if (ZSTD_isError(d) || d != dim) {
      ZSTD_freeDCtx(ctx);
      return i;
    }
  }
  ZSTD_freeDCtx(ctx);
  return count;
}

}  // extern "C"
