// Native TIFF + PNG decoder for color depth MIPs.
//
// C++ replacement of the reference's decode layer
// (imageprocessing/LocalTiffDecoder.java — an ImageJ TiffDecoder fork
// exposing IFD strip metadata — and ImageArrayUtils.packBitsUncompress
// :225-254 with its partial-range semantics; ImageArrayUtils.readImageArray
// :95 routes PNG through ImageIO): baseline TIFF parsing (both
// endiannesses), uncompressed / PackBits / LZW strips, PNG (zlib inflate
// + per-row unfilter; gray8/gray16/RGB8, RGBA alpha dropped like
// PIL.convert("RGB")), gray8, gray16 and RGB8 chunky images, full-image
// and row-range decodes, and a multithreaded batch API that decodes many
// in-memory files into one preallocated arena for direct device upload.
//
// Exposed as a plain C ABI for ctypes.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Reader {
    const uint8_t* p;
    size_t n;
    bool little;

    uint16_t u16(size_t off) const {
        if (off + 2 > n) return 0;
        return little ? (uint16_t)(p[off] | p[off + 1] << 8)
                      : (uint16_t)(p[off] << 8 | p[off + 1]);
    }
    uint32_t u32(size_t off) const {
        if (off + 4 > n) return 0;
        return little
            ? (uint32_t)p[off] | (uint32_t)p[off + 1] << 8 |
              (uint32_t)p[off + 2] << 16 | (uint32_t)p[off + 3] << 24
            : (uint32_t)p[off] << 24 | (uint32_t)p[off + 1] << 16 |
              (uint32_t)p[off + 2] << 8 | (uint32_t)p[off + 3];
    }
};

struct TiffInfo {
    uint32_t width = 0, height = 0;
    uint16_t bits = 8, samples = 1, compression = 1, photometric = 1;
    uint16_t predictor = 1, planar = 1;
    uint32_t rows_per_strip = 0;
    std::vector<uint64_t> strip_offsets, strip_lengths;
    bool ok = false;
};

uint64_t read_entry_value(const Reader& r, size_t entry, uint16_t type,
                          uint32_t index) {
    // inline or offset array value
    uint32_t count = r.u32(entry + 4);
    size_t value_off = entry + 8;
    size_t elem = (type == 3) ? 2 : 4;  // SHORT or LONG
    size_t total = (size_t)count * elem;
    size_t base = (total <= 4) ? value_off : r.u32(value_off);
    size_t off = base + (size_t)index * elem;
    return (type == 3) ? r.u16(off) : r.u32(off);
}

TiffInfo parse_tiff(const Reader& r) {
    TiffInfo t;
    if (r.n < 8) return t;
    size_t ifd = r.u32(4);
    if (ifd == 0 || ifd + 2 > r.n) return t;
    uint16_t nent = r.u16(ifd);
    for (uint16_t i = 0; i < nent; i++) {
        size_t e = ifd + 2 + (size_t)i * 12;
        uint16_t tag = r.u16(e), type = r.u16(e + 2);
        uint32_t count = r.u32(e + 4);
        switch (tag) {
            case 256: t.width = (uint32_t)read_entry_value(r, e, type, 0); break;
            case 257: t.height = (uint32_t)read_entry_value(r, e, type, 0); break;
            case 258: t.bits = (uint16_t)read_entry_value(r, e, type, 0); break;
            case 259: t.compression = (uint16_t)read_entry_value(r, e, type, 0); break;
            case 262: t.photometric = (uint16_t)read_entry_value(r, e, type, 0); break;
            case 273:
                t.strip_offsets.resize(count);
                for (uint32_t k = 0; k < count; k++)
                    t.strip_offsets[k] = read_entry_value(r, e, type, k);
                break;
            case 277: t.samples = (uint16_t)read_entry_value(r, e, type, 0); break;
            case 278: t.rows_per_strip = (uint32_t)read_entry_value(r, e, type, 0); break;
            case 279:
                t.strip_lengths.resize(count);
                for (uint32_t k = 0; k < count; k++)
                    t.strip_lengths[k] = read_entry_value(r, e, type, k);
                break;
            case 284: t.planar = (uint16_t)read_entry_value(r, e, type, 0); break;
            case 317: t.predictor = (uint16_t)read_entry_value(r, e, type, 0); break;
            default: break;
        }
    }
    if (t.rows_per_strip == 0) t.rows_per_strip = t.height;
    // photometric: only WhiteIsZero/BlackIsZero/RGB — palette (3) pixels
    // are colormap indices and must go through the PIL fallback.
    // The size cap (64k edges, <2^31 total bytes) keeps all later
    // size_t/uInt arithmetic overflow-free on untrusted headers.
    t.ok = t.width > 0 && t.height > 0 && !t.strip_offsets.empty() &&
           t.planar == 1 && t.photometric <= 2 &&
           t.width <= 65536 && t.height <= 65536 &&
           (uint64_t)t.width * t.height * t.samples * (t.bits / 8)
               < (1ull << 31) &&
           (t.compression == 1 || t.compression == 5 ||
            t.compression == 32773) &&
           (t.bits == 8 || t.bits == 16);
    return t;
}

// PackBits with the reference's partial-range semantics
// (ImageArrayUtils.packBitsUncompress:225-254): decode into output from
// `offset`, only materializing bytes in [start, end); returns new offset.
int64_t packbits_uncompress(const uint8_t* in, size_t in_len, uint8_t* out,
                            size_t out_len, int64_t offset, int64_t start,
                            int64_t end) {
    if (end == 0) end = INT64_MAX;
    size_t index = 0;
    int64_t pos = offset;
    while (pos < end && pos < (int64_t)out_len && index < in_len) {
        int8_t nv = (int8_t)in[index++];
        if (nv >= 0) {
            int len = nv + 1;
            if (index + len > in_len) len = (int)(in_len - index);
            for (int i = 0; i < len; i++) {
                if (pos >= start && pos < (int64_t)out_len)
                    out[pos] = in[index];
                index++;
                pos++;
            }
        } else if (nv != -128) {
            int len = -nv + 1;
            if (index >= in_len) break;
            uint8_t b = in[index++];
            for (int i = 0; i < len; i++) {
                if (pos >= start && pos < (int64_t)out_len) out[pos] = b;
                pos++;
            }
        }
    }
    return pos;
}

// Classic TIFF LZW (MSB-first codes, ClearCode 256, EOI 257).
bool lzw_uncompress(const uint8_t* in, size_t in_len, uint8_t* out,
                    size_t out_cap, size_t* out_len) {
    struct Entry { int prev; uint8_t byte; uint16_t len; };
    std::vector<Entry> table(4096);
    auto reset = [&](int& next, int& width) {
        next = 258;
        width = 9;
    };
    for (int i = 0; i < 256; i++) table[i] = {-1, (uint8_t)i, 1};
    int next_code, code_width;
    reset(next_code, code_width);
    size_t bitpos = 0;
    size_t pos = 0;
    int prev = -1;
    std::vector<uint8_t> scratch(4096);

    auto emit = [&](int code) -> bool {
        int len = table[code].len;
        if (pos + len > out_cap) return false;
        int c = code;
        for (int i = len - 1; i >= 0; i--) {
            scratch[i] = table[c].byte;
            c = table[c].prev;
        }
        std::memcpy(out + pos, scratch.data(), len);
        pos += len;
        return true;
    };

    while (bitpos + code_width <= in_len * 8) {
        uint32_t code = 0;
        for (int b = 0; b < code_width; b++) {
            size_t byte = (bitpos + b) >> 3;
            int bit = 7 - ((bitpos + b) & 7);
            code = (code << 1) | ((in[byte] >> bit) & 1);
        }
        bitpos += code_width;
        if (code == 256) {  // clear
            reset(next_code, code_width);
            prev = -1;
            continue;
        }
        if (code == 257) break;  // EOI
        if (prev < 0) {
            if (code > 255) return false;
            if (!emit((int)code)) return false;
            prev = (int)code;
            continue;
        }
        if ((int)code < next_code) {
            if (!emit((int)code)) return false;
            if (next_code < 4096) {
                int c = (int)code;
                while (table[c].prev >= 0) c = table[c].prev;
                table[next_code] = {prev, table[c].byte,
                                    (uint16_t)(table[prev].len + 1)};
                next_code++;
            }
        } else if ((int)code == next_code) {
            int c = prev;
            while (table[c].prev >= 0) c = table[c].prev;
            table[next_code] = {prev, table[c].byte,
                                (uint16_t)(table[prev].len + 1)};
            next_code++;
            if (!emit((int)code)) return false;
        } else {
            return false;
        }
        prev = (int)code;
        // TIFF switches width one code EARLY (when next_code+1 hits limit)
        if (next_code + 1 >= (1 << code_width) && code_width < 12)
            code_width++;
    }
    *out_len = pos;
    return true;
}

void apply_predictor(uint8_t* row, uint32_t width, int samples, int bits) {
    if (bits == 8) {
        for (uint32_t x = 1; x < width; x++)
            for (int s = 0; s < samples; s++)
                row[x * samples + s] =
                    (uint8_t)(row[x * samples + s] +
                              row[(x - 1) * samples + s]);
    } else {
        uint16_t* r16 = (uint16_t*)row;
        for (uint32_t x = 1; x < width; x++)
            for (int s = 0; s < samples; s++)
                r16[x * samples + s] =
                    (uint16_t)(r16[x * samples + s] +
                               r16[(x - 1) * samples + s]);
    }
}

// Decode rows [y0, y1) of the image into out (row-major, tight).
int decode_rows(const Reader& r, const TiffInfo& t, uint8_t* out,
                size_t out_cap, uint32_t y0, uint32_t y1) {
    size_t bpp = (size_t)t.samples * (t.bits / 8);
    size_t row_bytes = (size_t)t.width * bpp;
    if (out_cap < row_bytes * (y1 - y0)) return -2;
    uint32_t covered = 0;
    std::vector<uint8_t> strip_buf;
    for (size_t si = 0; si < t.strip_offsets.size(); si++) {
        uint32_t sy0 = (uint32_t)(si * t.rows_per_strip);
        uint32_t sy1 = std::min<uint32_t>(sy0 + t.rows_per_strip, t.height);
        if (sy1 <= y0 || sy0 >= y1) continue;
        size_t soff = t.strip_offsets[si];
        if (soff >= r.n) return -3;
        size_t slen = si < t.strip_lengths.size() ? t.strip_lengths[si]
                                                  : r.n - soff;
        if (slen > r.n - soff) slen = r.n - soff;
        size_t want = row_bytes * (sy1 - sy0);
        strip_buf.resize(want);
        const uint8_t* data;
        if (t.compression == 1) {
            if (slen < want) return -3;
            data = r.p + soff;
        } else if (t.compression == 32773) {
            packbits_uncompress(r.p + soff, slen, strip_buf.data(), want,
                                0, 0, (int64_t)want);
            data = strip_buf.data();
        } else {  // LZW
            size_t got = 0;
            if (!lzw_uncompress(r.p + soff, slen, strip_buf.data(), want,
                                &got))
                return -4;
            data = strip_buf.data();
        }
        bool swapped = false;
        if (t.compression != 1 && t.bits == 16 && !r.little) {
            // 16-bit samples arrive big-endian; the horizontal predictor
            // sums SAMPLE values, so MM strips must be byte-swapped
            // BEFORE differencing
            for (size_t i = 0; i + 1 < want; i += 2)
                std::swap(strip_buf[i], strip_buf[i + 1]);
            swapped = true;
        }
        if (t.compression != 1 && t.predictor == 2) {
            for (uint32_t y = 0; y < sy1 - sy0; y++)
                apply_predictor(strip_buf.data() + (size_t)y * row_bytes,
                                t.width, t.samples, t.bits);
        }
        uint32_t cy0 = std::max(sy0, y0), cy1 = std::min(sy1, y1);
        uint8_t* dst = out + (size_t)(cy0 - y0) * row_bytes;
        size_t nb = (size_t)(cy1 - cy0) * row_bytes;
        std::memcpy(dst, data + (size_t)(cy0 - sy0) * row_bytes, nb);
        if (t.bits == 16 && !r.little && !swapped) {
            for (size_t i = 0; i + 1 < nb; i += 2)
                std::swap(dst[i], dst[i + 1]);
        }
        covered += cy1 - cy0;
    }
    // a truncated IFD whose strips do not cover the request would leave
    // uninitialized output — fail so callers fall back to PIL
    if (covered != y1 - y0) return -5;
    if (t.photometric == 0) {  // WhiteIsZero
        if (t.bits == 8) {
            size_t nb = row_bytes * (y1 - y0);
            for (size_t i = 0; i < nb; i++)
                out[i] = (uint8_t)(255 - out[i]);
        } else {
            uint16_t* v = (uint16_t*)out;
            size_t nvals = row_bytes * (y1 - y0) / 2;
            for (size_t i = 0; i < nvals; i++)
                v[i] = (uint16_t)(65535 - v[i]);
        }
    }
    return 0;
}

// ---------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------

const uint8_t PNG_MAGIC[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};

struct PngInfo {
    uint32_t width = 0, height = 0;
    uint8_t depth = 0, color = 0, interlace = 0;
    // channel count as stored in the file
    int channels_in = 0;
    // channel count after alpha drop (what we output)
    int channels_out = 0;
    bool ok = false;
};

uint32_t be32(const uint8_t* p) {
    return (uint32_t)p[0] << 24 | (uint32_t)p[1] << 16 |
           (uint32_t)p[2] << 8 | (uint32_t)p[3];
}

bool is_png(const uint8_t* p, size_t n) {
    return n >= 8 && std::memcmp(p, PNG_MAGIC, 8) == 0;
}

PngInfo parse_png(const uint8_t* p, size_t n) {
    PngInfo t;
    if (!is_png(p, n) || n < 33) return t;
    // IHDR must be the first chunk
    if (be32(p + 8) != 13 || std::memcmp(p + 12, "IHDR", 4) != 0) return t;
    t.width = be32(p + 16);
    t.height = be32(p + 20);
    t.depth = p[24];
    t.color = p[25];
    t.interlace = p[28];
    switch (t.color) {
        case 0: t.channels_in = 1; t.channels_out = 1; break;   // gray
        case 2: t.channels_in = 3; t.channels_out = 3; break;   // rgb
        case 4: t.channels_in = 2; t.channels_out = 1; break;   // gray+a
        case 6: t.channels_in = 4; t.channels_out = 3; break;   // rgba
        default: return t;                                      // palette
    }
    // 16-bit only for pure gray (gradient images); color stays 8-bit
    bool depth_ok = (t.depth == 8) || (t.depth == 16 && t.color == 0);
    // size cap: keeps (row_raw+1)*height and the zlib uInt counters
    // overflow-free on untrusted headers
    bool size_ok = t.width > 0 && t.height > 0 &&
                   t.width <= 65536 && t.height <= 65536 &&
                   ((uint64_t)t.width * t.channels_in * (t.depth / 8) + 1) *
                       t.height < (1ull << 31);
    t.ok = size_ok && depth_ok &&
           t.interlace == 0 && p[26] == 0 && p[27] == 0;
    return t;
}

int paeth(int a, int b, int c) {
    int pp = a + b - c;
    int pa = std::abs(pp - a), pb = std::abs(pp - b), pc = std::abs(pp - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

// Decode a whole PNG into out (tight rows, alpha dropped, 16-bit
// converted to host little-endian). Returns 0 on success.
int png_decode(const uint8_t* p, size_t n, uint8_t* out, size_t out_cap) {
    PngInfo t = parse_png(p, n);
    if (!t.ok) return -1;
    size_t bytes_per_sample = t.depth / 8;
    size_t bpp = (size_t)t.channels_in * bytes_per_sample;  // filter unit
    size_t row_raw = (size_t)t.width * bpp;
    size_t row_out = (size_t)t.width * t.channels_out * bytes_per_sample;
    if (out_cap < row_out * t.height) return -2;

    // inflate the concatenation of all IDAT chunks
    std::vector<uint8_t> raw((row_raw + 1) * t.height);
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit(&zs) != Z_OK) return -3;
    zs.next_out = raw.data();
    zs.avail_out = (uInt)raw.size();
    size_t off = 8;
    int zret = Z_OK;
    while (off + 12 <= n) {
        uint32_t len = be32(p + off);
        const uint8_t* type = p + off + 4;
        const uint8_t* data = p + off + 8;
        if (off + 12 + (size_t)len > n) break;
        if (std::memcmp(type, "IDAT", 4) == 0) {
            zs.next_in = const_cast<uint8_t*>(data);
            zs.avail_in = len;
            zret = inflate(&zs, Z_NO_FLUSH);
            if (zret != Z_OK && zret != Z_STREAM_END) {
                inflateEnd(&zs);
                return -3;
            }
        } else if (std::memcmp(type, "IEND", 4) == 0) {
            break;
        }
        off += 12 + (size_t)len;
    }
    bool complete = (zs.avail_out == 0) || (zret == Z_STREAM_END &&
                    zs.total_out == raw.size());
    inflateEnd(&zs);
    if (!complete) return -3;

    // unfilter in place, then emit (dropping alpha samples if any)
    std::vector<uint8_t> prev(row_raw, 0);
    for (uint32_t y = 0; y < t.height; y++) {
        uint8_t* rp = raw.data() + (size_t)y * (row_raw + 1);
        uint8_t filter = rp[0];
        uint8_t* row = rp + 1;
        switch (filter) {
            case 0: break;
            case 1:
                for (size_t i = bpp; i < row_raw; i++)
                    row[i] = (uint8_t)(row[i] + row[i - bpp]);
                break;
            case 2:
                for (size_t i = 0; i < row_raw; i++)
                    row[i] = (uint8_t)(row[i] + prev[i]);
                break;
            case 3:
                for (size_t i = 0; i < row_raw; i++) {
                    int a = i >= bpp ? row[i - bpp] : 0;
                    row[i] = (uint8_t)(row[i] + ((a + prev[i]) >> 1));
                }
                break;
            case 4:
                for (size_t i = 0; i < row_raw; i++) {
                    int a = i >= bpp ? row[i - bpp] : 0;
                    int c = i >= bpp ? prev[i - bpp] : 0;
                    row[i] = (uint8_t)(row[i] + paeth(a, prev[i], c));
                }
                break;
            default:
                return -4;
        }
        std::memcpy(prev.data(), row, row_raw);
        uint8_t* dst = out + (size_t)y * row_out;
        if (t.channels_in == t.channels_out) {
            if (t.depth == 8) {
                std::memcpy(dst, row, row_out);
            } else {  // 16-bit gray: big-endian samples -> host little
                for (uint32_t x = 0; x < t.width; x++) {
                    dst[2 * x] = row[2 * x + 1];
                    dst[2 * x + 1] = row[2 * x];
                }
            }
        } else {  // drop the trailing alpha sample per pixel
            int ci = t.channels_in, co = t.channels_out;
            for (uint32_t x = 0; x < t.width; x++)
                for (int s = 0; s < co; s++)
                    dst[x * co + s] = row[x * ci + s];
        }
    }
    return 0;
}

// ---------------------------------------------------------------------
// generic (TIFF or PNG) entry helpers
// ---------------------------------------------------------------------

bool is_tiff(const uint8_t* p, size_t n, bool* little);

int img_info_impl(const uint8_t* buf, size_t len, uint32_t* width,
                  uint32_t* height, uint32_t* channels, uint32_t* bits) {
    bool little;
    if (is_tiff(buf, len, &little)) {
        Reader r{buf, len, little};
        TiffInfo t = parse_tiff(r);
        if (!t.ok) return -1;
        *width = t.width;
        *height = t.height;
        *channels = t.samples;
        *bits = t.bits;
        return 0;
    }
    if (is_png(buf, len)) {
        PngInfo t = parse_png(buf, len);
        if (!t.ok) return -1;
        *width = t.width;
        *height = t.height;
        *channels = (uint32_t)t.channels_out;
        *bits = t.depth;
        return 0;
    }
    return -1;
}

int img_decode_impl(const uint8_t* buf, size_t len, uint8_t* out,
                    size_t out_cap) {
    bool little;
    if (is_tiff(buf, len, &little)) {
        Reader r{buf, len, little};
        TiffInfo t = parse_tiff(r);
        if (!t.ok) return -1;
        return decode_rows(r, t, out, out_cap, 0, t.height);
    }
    if (is_png(buf, len)) return png_decode(buf, len, out, out_cap);
    return -1;
}

bool is_tiff(const uint8_t* p, size_t n, bool* little) {
    if (n < 8) return false;
    if (p[0] == 'I' && p[1] == 'I' && p[2] == 42 && p[3] == 0) {
        *little = true;
        return true;
    }
    if (p[0] == 'M' && p[1] == 'M' && p[2] == 0 && p[3] == 42) {
        *little = false;
        return true;
    }
    return false;
}

}  // namespace

extern "C" {

// Query dims: returns 0 on success and fills width/height/channels/bits.
int cdm_tiff_info(const uint8_t* buf, size_t len, uint32_t* width,
                  uint32_t* height, uint32_t* channels, uint32_t* bits) {
    bool little;
    if (!is_tiff(buf, len, &little)) return -1;
    Reader r{buf, len, little};
    TiffInfo t = parse_tiff(r);
    if (!t.ok) return -1;
    *width = t.width;
    *height = t.height;
    *channels = t.samples;
    *bits = t.bits;
    return 0;
}

// Decode rows [y0, y1) (y1 == 0 means the whole image).
int cdm_tiff_decode(const uint8_t* buf, size_t len, uint8_t* out,
                    size_t out_cap, uint32_t y0, uint32_t y1) {
    bool little;
    if (!is_tiff(buf, len, &little)) return -1;
    Reader r{buf, len, little};
    TiffInfo t = parse_tiff(r);
    if (!t.ok) return -1;
    if (y1 == 0) y1 = t.height;
    if (y0 >= y1 || y1 > t.height) return -2;
    return decode_rows(r, t, out, out_cap, y0, y1);
}

// Reference-compatible PackBits partial decode
// (ImageArrayUtils.packBitsUncompress).
long long cdm_packbits_uncompress(const uint8_t* in, size_t in_len,
                                  uint8_t* out, size_t out_len,
                                  long long offset, long long start,
                                  long long end) {
    return packbits_uncompress(in, in_len, out, out_len, offset, start,
                               end);
}

// Batch decode: n in-memory TIFF files into one arena with a fixed
// per-image stride; all images must match (width, height, channels).
// results[i] = 0 on success. Uses up to n_threads workers.
void cdm_tiff_decode_batch(const uint8_t** bufs, const size_t* lens,
                           int n, uint8_t* arena, size_t stride,
                           uint32_t y0, uint32_t y1, int n_threads,
                           int* results) {
    std::atomic<int> next{0};
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            results[i] = cdm_tiff_decode(bufs[i], lens[i],
                                         arena + (size_t)i * stride,
                                         stride, y0, y1);
        }
    };
    int nt = std::max(1, std::min(n_threads, n));
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; i++) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

// Generic (TIFF or PNG) info/decode: PNG alpha channels are dropped
// (channels reports the OUTPUT count), 16-bit samples are host-endian.
int cdm_img_info(const uint8_t* buf, size_t len, uint32_t* width,
                 uint32_t* height, uint32_t* channels, uint32_t* bits) {
    return img_info_impl(buf, len, width, height, channels, bits);
}

int cdm_img_decode(const uint8_t* buf, size_t len, uint8_t* out,
                   size_t out_cap) {
    return img_decode_impl(buf, len, out, out_cap);
}

// Batch decode of mixed TIFF/PNG blobs into one arena (full images).
// exp_w/exp_h/exp_c: the arena slot geometry every image must match
// (0 = skip the check); a smaller valid image would otherwise
// tight-pack its own row length into the slot and scramble silently.
void cdm_img_decode_batch(const uint8_t** bufs, const size_t* lens,
                          int n, uint8_t* arena, size_t stride,
                          uint32_t exp_w, uint32_t exp_h, uint32_t exp_c,
                          int n_threads, int* results) {
    std::atomic<int> next{0};
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            if (exp_w) {
                uint32_t w, h, c, b;
                if (img_info_impl(bufs[i], lens[i], &w, &h, &c, &b) != 0 ||
                    w != exp_w || h != exp_h || c != exp_c || b != 8) {
                    results[i] = -6;
                    continue;
                }
            }
            results[i] = img_decode_impl(bufs[i], lens[i],
                                         arena + (size_t)i * stride,
                                         stride);
        }
    };
    int nt = std::max(1, std::min(n_threads, n));
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; i++) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

// Sparse COO select over a decoded uint8 RGB arena: for each image,
// emit (flat pixel index, rgb) of every pixel with ANY channel >
// threshold.  Two-pass: cdm_coo_count fills per-image foreground
// counts (the host prefix-sums them into offsets), cdm_coo_fill writes
// the compacted triplets.  This is the host half of the sparse
// key-plane upload (ops/common.pack_target_planes_keys_sparse) — the
// numpy nonzero/fancy-index path measured ~24 ms/target, ~100x the
// memory-bound floor this pass runs at.
// Work splits over (image, pixel-chunk) pairs, not just images, so a
// SINGLE-image arena (the per-mask query-foreground select,
// io/native_decoder._select_query_foreground) still uses every thread
// (ADVICE r4: image-only splitting left n_img=1 on one core).
static inline int64_t coo_chunk_px(int64_t n_img, int64_t n_px,
                                   int n_threads) {
    // aim for ~4 chunks per thread across the whole arena, but never
    // chunks smaller than 64 KB of pixels (scan is memory-bound;
    // tiny chunks are all scheduling overhead)
    int64_t total = n_img * n_px;
    int64_t want = std::max<int64_t>(1, (int64_t)n_threads * 4);
    int64_t c = std::max<int64_t>((total + want - 1) / want, 64 * 1024);
    return std::min<int64_t>(c, n_px);
}

static inline int64_t coo_count_range(const uint8_t* p, int64_t j0,
                                      int64_t j1, int thr) {
    int64_t c = 0;
    for (int64_t j = j0; j < j1; j++) {
        const uint8_t* px = p + j * 3;
        c += (px[0] > thr) | (px[1] > thr) | (px[2] > thr);
    }
    return c;
}

void cdm_coo_count(const uint8_t* arena, int64_t n_img, int64_t n_px,
                   int thr, int64_t* counts, int n_threads) {
    const int64_t chunk = coo_chunk_px(n_img, n_px, n_threads);
    const int64_t cpi = (n_px + chunk - 1) / chunk;  // chunks per image
    const int64_t n_work = n_img * cpi;
    for (int64_t i = 0; i < n_img; i++) counts[i] = 0;
    std::vector<std::atomic<int64_t>> acc(n_img);
    for (auto& a : acc) a.store(0, std::memory_order_relaxed);
    std::atomic<int64_t> next{0};
    auto worker = [&]() {
        for (;;) {
            int64_t wi = next.fetch_add(1);
            if (wi >= n_work) break;
            int64_t i = wi / cpi, k = wi % cpi;
            int64_t j0 = k * chunk, j1 = std::min(j0 + chunk, n_px);
            acc[i].fetch_add(
                coo_count_range(arena + i * n_px * 3, j0, j1, thr),
                std::memory_order_relaxed);
        }
    };
    int nt = std::max(1, (int)std::min<int64_t>(n_threads, n_work));
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; i++) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
    for (int64_t i = 0; i < n_img; i++)
        counts[i] = acc[i].load(std::memory_order_relaxed);
}

void cdm_coo_fill(const uint8_t* arena, int64_t n_img, int64_t n_px,
                  int thr, const int64_t* offsets, int32_t* pos_out,
                  int32_t* tidx_out, uint8_t* rgb_out, int n_threads) {
    const int64_t chunk = coo_chunk_px(n_img, n_px, n_threads);
    const int64_t cpi = (n_px + chunk - 1) / chunk;
    const int64_t n_work = n_img * cpi;
    // pass 1 (parallel): per-chunk foreground counts; pass 2 (serial,
    // cheap): prefix-sum into per-chunk output offsets — position
    // order within each image is preserved because chunks are
    // contiguous; pass 3 (parallel): compact each chunk at its offset
    std::vector<int64_t> coff(n_work);
    {
        std::atomic<int64_t> next{0};
        auto worker = [&]() {
            for (;;) {
                int64_t wi = next.fetch_add(1);
                if (wi >= n_work) break;
                int64_t i = wi / cpi, k = wi % cpi;
                int64_t j0 = k * chunk, j1 = std::min(j0 + chunk, n_px);
                coff[wi] = coo_count_range(arena + i * n_px * 3, j0, j1,
                                           thr);
            }
        };
        int nt = std::max(1, (int)std::min<int64_t>(n_threads, n_work));
        std::vector<std::thread> threads;
        for (int i = 0; i < nt; i++) threads.emplace_back(worker);
        for (auto& th : threads) th.join();
    }
    for (int64_t i = 0; i < n_img; i++) {
        int64_t o = offsets[i];
        for (int64_t k = 0; k < cpi; k++) {
            int64_t c = coff[i * cpi + k];
            coff[i * cpi + k] = o;
            o += c;
        }
    }
    std::atomic<int64_t> next{0};
    auto worker = [&]() {
        for (;;) {
            int64_t wi = next.fetch_add(1);
            if (wi >= n_work) break;
            int64_t i = wi / cpi, k = wi % cpi;
            int64_t j0 = k * chunk, j1 = std::min(j0 + chunk, n_px);
            const uint8_t* p = arena + i * n_px * 3;
            int64_t o = coff[wi];
            for (int64_t j = j0; j < j1; j++) {
                const uint8_t* px = p + j * 3;
                if ((px[0] > thr) | (px[1] > thr) | (px[2] > thr)) {
                    pos_out[o] = (int32_t)j;
                    tidx_out[o] = (int32_t)i;
                    rgb_out[o * 3] = px[0];
                    rgb_out[o * 3 + 1] = px[1];
                    rgb_out[o * 3 + 2] = px[2];
                    o++;
                }
            }
        }
    };
    int nt = std::max(1, (int)std::min<int64_t>(n_threads, n_work));
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; i++) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

// Full-plane store-row fields in one pass (native twin of
// io/shape_pack.build_row_fields, bit-identical): per pixel i
//   zsl[i]      = slice_lut[(r<<16)|(g<<8)|b]          (zgap RGB)
//   grad_thr[i] = grad[i] > gap_threshold ? grad[i] : 0
//   tfg bit i   = any t_rgb channel > mask_threshold   (little order)
// Single-threaded by design: the engine calls it from its decode pool
// (ctypes drops the GIL), so parallelism comes from the pool.
void cdm_build_shape_row(const uint8_t* t_rgb, const uint16_t* grad,
                         const uint8_t* zgap_rgb, int64_t n_px,
                         const uint16_t* slice_lut, int mask_threshold,
                         int gap_threshold, uint16_t* zsl,
                         uint16_t* grad_thr, uint8_t* tfg_bits) {
    const int64_t n_bytes = (n_px + 7) >> 3;
    for (int64_t i = 0; i < n_bytes; i++) tfg_bits[i] = 0;
    // (a 16-ahead software prefetch of the LUT line was measured 1.7x
    // SLOWER on uniform-random zgap input — the miss queue is already
    // saturated; real zgap images have small palettes and mostly hit)
    for (int64_t i = 0; i < n_px; i++) {
        const uint8_t* z = zgap_rgb + i * 3;
        zsl[i] = slice_lut[((uint32_t)z[0] << 16) |
                           ((uint32_t)z[1] << 8) | z[2]];
        grad_thr[i] = grad[i] > gap_threshold ? grad[i] : 0;
        const uint8_t* t = t_rgb + i * 3;
        if (t[0] > mask_threshold || t[1] > mask_threshold ||
            t[2] > mask_threshold)
            tfg_bits[i >> 3] |= (uint8_t)(1u << (i & 7));
    }
}

// Shape-pass dispatch tile straight from the packed-variant store
// (io/shape_pack.py mmaps): for T store rows, gather the mask-support
// columns and assemble the final split planes
//   t_gap uint32 [n_or, n_gap_pad, T]  = (zsl << sl_shift) | grad
//   t_he  uint32 [n_or, n_he_words, T] = bitpacked foreground
// in one threaded pass — the native twin of
// ops/shape_score.select_target_tile_from_store (bit-identical; the
// numpy path stays as the fallback and the test oracle).  Bit b of he
// word w is support row 32*w + b (little-endian, like np.packbits
// bitorder="little" viewed as uint32).
//
// zsl/grad are uint16 rows of n_px elements, tfg is a bitpacked row of
// ceil(n_px/8) bytes (bit i of byte i>>3 at position i&7).  pos_gap
// [sg] indexes zsl; g_pos [n_or*sg] indexes grad (straight + mirrored
// columns); h_pos [n_or*sh] are foreground BIT addresses; keep_he
// [n_or*sh] gates the excluded label region (NULL = keep all).  Gap pad
// rows j >= sg and he words past the packed bits are zeroed here, so
// callers may pass uninitialized outputs.
void cdm_shape_tile_from_store(
        const uint16_t* zsl_base, const uint16_t* grad_base,
        const uint8_t* tfg_base, int64_t zsl_stride, int64_t grad_stride,
        int64_t tfg_stride, const int64_t* rows, int64_t n_rows,
        const int32_t* pos_gap, int64_t sg, const int32_t* g_pos,
        const int32_t* h_pos, int64_t sh, const uint8_t* keep_he,
        int n_or, int64_t n_gap_pad, int64_t n_he_words, int sl_shift,
        uint32_t* t_gap, uint32_t* t_he, int n_threads) {
    const int64_t T = n_rows;
    std::atomic<int64_t> next{0};
    auto worker = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= T) break;
            const uint16_t* z = zsl_base + rows[i] * zsl_stride;
            const uint16_t* g = grad_base + rows[i] * grad_stride;
            const uint8_t* t = tfg_base + rows[i] * tfg_stride;
            for (int o = 0; o < n_or; o++) {
                uint32_t* outg = t_gap + (int64_t)o * n_gap_pad * T + i;
                const int32_t* gp = g_pos + (int64_t)o * sg;
                for (int64_t j = 0; j < sg; j++)
                    outg[j * T] = ((uint32_t)z[pos_gap[j]] << sl_shift) |
                                  g[gp[j]];
                for (int64_t j = sg; j < n_gap_pad; j++) outg[j * T] = 0;
                const int32_t* hp = h_pos + (int64_t)o * sh;
                const uint8_t* ke = keep_he ? keep_he + (int64_t)o * sh
                                            : nullptr;
                uint32_t* outh = t_he + (int64_t)o * n_he_words * T + i;
                int64_t w = 0;
                uint32_t word = 0;
                int b = 0;
                for (int64_t j = 0; j < sh; j++) {
                    uint32_t bit = (t[hp[j] >> 3] >> (hp[j] & 7)) & 1u;
                    if (ke) bit &= ke[j];
                    word |= bit << b;
                    if (++b == 32) {
                        outh[w++ * T] = word;
                        word = 0;
                        b = 0;
                    }
                }
                if (b) outh[w++ * T] = word;
                for (; w < n_he_words; w++) outh[w * T] = 0;
            }
        }
    };
    int nt = (int)std::max((int64_t)1,
                           std::min((int64_t)n_threads, T));
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; i++) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

}  // extern "C"
