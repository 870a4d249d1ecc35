// VP8L (lossless WebP) decoder — native host hot path.
//
// Mirrors webp_tpu/decode/vp8l.py (the verified bit-exact reference
// implementation) : LSB-first bit reader, canonical two-level Huffman tables,
// meta-entropy groups, color cache, LZ77 backrefs, and the four inverse
// transforms. Used for full-image VP8L decode and for ALPH alpha planes.
//
// Build: part of libwebp_tpu_native.so (see io/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace vp8l {

struct BitReader {
    const uint8_t* data;
    int len;
    int pos = 0;
    uint64_t acc = 0;
    int nbits = 0;
    bool error = false;

    void init(const uint8_t* d, int l) {
        data = d;
        len = l;
    }
    void fill() {
        if (pos + 8 <= len) {
            uint64_t look;
            memcpy(&look, data + pos, 8);  // little-endian hosts
            int take = (63 - nbits) >> 3;
            acc |= look << nbits;
            pos += take;
            nbits |= 56;
        } else {
            while (pos < len && nbits < 56) {
                acc |= (uint64_t)data[pos] << nbits;
                nbits += 8;
                pos++;
            }
        }
    }
    uint32_t peek(int n) const { return (uint32_t)(acc & ((1ull << n) - 1)); }
    void consume(int n) {
        if (nbits < n) {
            error = true;
            nbits = 0;
            acc = 0;
            return;
        }
        acc >>= n;
        nbits -= n;
    }
    uint32_t read(int n) {
        if (nbits < n) fill();
        uint32_t v = peek(n);
        consume(n);
        return v;
    }
};

// Two-level canonical Huffman decoder (root 10 bits).
struct Huffman {
    static const int ROOT_BITS = 10;
    bool single = false;
    uint16_t single_sym = 0;
    // primary entry: len<=ROOT -> (len<<12)|sym ; len>ROOT -> (len<<12)|sub_index
    std::vector<uint32_t> primary;
    std::vector<uint32_t> secondary;  // (len) | (sym<<4)
    int max_len = 0;

    // Build from code lengths; returns false on invalid code.
    bool build(const uint16_t* lengths, int n) {
        int count = 0, sym0 = 0;
        int hist[16] = {0};
        for (int i = 0; i < n; i++) {
            if (lengths[i]) {
                count++;
                sym0 = i;
                hist[lengths[i]]++;
            }
            if (lengths[i] > 15) return false;
        }
        if (count == 0) return false;
        if (count == 1) {
            single = true;
            single_sym = (uint16_t)sym0;
            return true;
        }
        max_len = 15;
        while (max_len > 1 && hist[max_len] == 0) max_len--;
        long space = 0;
        for (int l = 1; l <= max_len; l++) space = (space << 1) + hist[l];
        if (space != (1l << max_len)) return false;

        // canonical codes
        int first[17] = {0};
        int code = 0;
        for (int l = 1; l <= max_len; l++) {
            first[l] = code;
            code = (code + hist[l]) << 1;
        }
        int root = ROOT_BITS < max_len ? ROOT_BITS : max_len;
        primary.assign(1u << root, 0);
        secondary.clear();

        int next_code[17];
        memcpy(next_code, first, sizeof(first));
        // For secondary tables: track per-prefix allocation.
        std::vector<int> sub_start(1u << root, -1);
        for (int sym = 0; sym < n; sym++) {
            int l = lengths[sym];
            if (!l) continue;
            int c = next_code[l]++;
            // reverse bits
            uint32_t rev = 0;
            for (int b = 0; b < l; b++) rev |= ((c >> b) & 1) << (l - 1 - b);
            if (l <= root) {
                for (uint32_t i = rev; i < primary.size(); i += (1u << l))
                    primary[i] = ((uint32_t)l << 12) | sym;
            } else {
                uint32_t prefix = rev & ((1u << root) - 1);
                if (sub_start[prefix] < 0) {
                    // allocate subtable of size 1 << (max_len - root)
                    sub_start[prefix] = (int)secondary.size();
                    secondary.resize(secondary.size() + (1u << (max_len - root)), 0);
                    primary[prefix] = 0x80000000u | (uint32_t)sub_start[prefix];
                }
                uint32_t hi = rev >> root;
                for (uint32_t i = hi; i < (1u << (max_len - root)); i += (1u << (l - root)))
                    secondary[sub_start[prefix] + i] = ((uint32_t)l) | ((uint32_t)sym << 4);
            }
        }
        return true;
    }

    int read_symbol(BitReader& br) const {
        if (single) return single_sym;
        uint32_t v = (uint32_t)(br.acc & 0xFFFF);
        uint32_t e = primary[v & (primary.size() - 1)];
        if (!(e & 0x80000000u)) {
            br.consume(e >> 12);
            return (int)(e & 0xFFF);
        }
        uint32_t sub = e & 0x7FFFFFFF;
        uint32_t idx = (v >> ROOT_BITS) & ((1u << (max_len - ROOT_BITS)) - 1);
        uint32_t se = secondary[sub + idx];
        br.consume(se & 0xF);
        return (int)(se >> 4);
    }
};

static const int CL_ORDER[19] = {17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15};

static const int8_t DIST_MAP[120][2] = {
    {0,1},{1,0},{1,1},{-1,1},{0,2},{2,0},{1,2},{-1,2},{2,1},{-2,1},{2,2},{-2,2},
    {0,3},{3,0},{1,3},{-1,3},{3,1},{-3,1},{2,3},{-2,3},{3,2},{-3,2},{0,4},{4,0},
    {1,4},{-1,4},{4,1},{-4,1},{3,3},{-3,3},{2,4},{-2,4},{4,2},{-4,2},{0,5},{3,4},
    {-3,4},{4,3},{-4,3},{5,0},{1,5},{-1,5},{5,1},{-5,1},{2,5},{-2,5},{5,2},{-5,2},
    {4,4},{-4,4},{3,5},{-3,5},{5,3},{-5,3},{0,6},{6,0},{1,6},{-1,6},{6,1},{-6,1},
    {2,6},{-2,6},{6,2},{-6,2},{4,5},{-4,5},{5,4},{-5,4},{3,6},{-3,6},{6,3},{-6,3},
    {0,7},{7,0},{1,7},{-1,7},{5,5},{-5,5},{7,1},{-7,1},{4,6},{-4,6},{6,4},{-6,4},
    {2,7},{-2,7},{7,2},{-7,2},{3,7},{-3,7},{7,3},{-7,3},{5,6},{-5,6},{6,5},{-6,5},
    {8,0},{4,7},{-4,7},{7,4},{-7,4},{8,1},{8,2},{6,6},{-6,6},{8,3},{5,7},{-5,7},
    {7,5},{-7,5},{8,4},{6,7},{-6,7},{7,6},{-7,6},{8,5},{7,7},{-7,7},{8,6},{8,7},
};

struct Decoder {
    BitReader br;
    bool err = false;

    int subsample(int size, int bits) { return (size + (1 << bits) - 1) >> bits; }

    bool read_huffman_code(int alphabet, Huffman& tree) {
        if (br.read(1) == 1) {  // simple
            int num = (int)br.read(1) + 1;
            int first8 = (int)br.read(1);
            int sym0 = (int)br.read(first8 ? 8 : 1);
            if (sym0 >= alphabet) return false;
            if (num == 1) {
                uint16_t lens1[1] = {0};
                tree.single = true;
                tree.single_sym = (uint16_t)sym0;
                (void)lens1;
                return true;
            }
            int sym1 = (int)br.read(8);
            if (sym1 >= alphabet) return false;
            // two-symbol tree: codes 0/1, 1 bit each
            std::vector<uint16_t> lens(alphabet, 0);
            lens[sym0] = 1;
            lens[sym1] = 1;
            // careful: canonical assignment gives sym with smaller index code 0;
            // spec order is (zero_symbol, one_symbol) explicitly:
            Huffman t;
            t.primary.assign(1u << Huffman::ROOT_BITS, 0);
            for (uint32_t i = 0; i < t.primary.size(); i += 2) {
                t.primary[i] = (1u << 12) | sym0;
                t.primary[i + 1] = (1u << 12) | sym1;
            }
            t.max_len = 1;
            tree = t;
            return true;
        }
        uint16_t cl_lens[19] = {0};
        int num_codes = 4 + (int)br.read(4);
        for (int i = 0; i < num_codes; i++) cl_lens[CL_ORDER[i]] = (uint16_t)br.read(3);
        Huffman cl;
        if (!cl.build(cl_lens, 19)) return false;

        int max_symbol;
        if (br.read(1) == 1) {
            int nbits = 2 + 2 * (int)br.read(3);
            max_symbol = 2 + (int)br.read(nbits);
            if (max_symbol > alphabet) return false;
        } else {
            max_symbol = alphabet;
        }

        std::vector<uint16_t> lens(alphabet, 0);
        int prev = 8;
        int symbol = 0;
        while (symbol < alphabet) {
            if (max_symbol == 0) break;
            max_symbol--;
            br.fill();
            int cl_sym = cl.read_symbol(br);
            if (br.error) return false;
            if (cl_sym < 16) {
                lens[symbol++] = (uint16_t)cl_sym;
                if (cl_sym) prev = cl_sym;
            } else {
                int repeat, fill_len = 0;
                if (cl_sym == 16) {
                    repeat = 3 + (int)br.read(2);
                    fill_len = prev;
                } else if (cl_sym == 17) {
                    repeat = 3 + (int)br.read(3);
                } else if (cl_sym == 18) {
                    repeat = 11 + (int)br.read(7);
                } else {
                    return false;
                }
                if (symbol + repeat > alphabet) return false;
                for (int i = 0; i < repeat; i++) lens[symbol++] = (uint16_t)fill_len;
            }
        }
        return tree.build(lens.data(), alphabet);
    }

    int prefix_value(int code) {
        if (code < 4) return code + 1;
        int extra = (code - 2) >> 1;
        int offset = (2 + (code & 1)) << extra;
        if (br.nbits < extra) br.fill();
        int bits = (int)br.peek(extra);
        br.consume(extra);
        return offset + bits + 1;
    }

    // Decode one image stream into out (RGBA, w*h*4 bytes).
    bool decode_stream(int w, int h, bool is_argb, uint8_t* out) {
        int cache_bits = 0;
        if (br.read(1) == 1) {
            cache_bits = (int)br.read(4);
            if (cache_bits < 1 || cache_bits > 11) return false;
        }

        int meta_bits = 0, hx = 1;
        std::vector<uint16_t> meta_image;
        int num_groups = 1;
        if (is_argb && br.read(1) == 1) {
            meta_bits = (int)br.read(3) + 2;
            hx = subsample(w, meta_bits);
            int hy = subsample(h, meta_bits);
            std::vector<uint8_t> sub((size_t)hx * hy * 4);
            if (!decode_stream(hx, hy, false, sub.data())) return false;
            meta_image.resize((size_t)hx * hy);
            for (size_t i = 0; i < meta_image.size(); i++) {
                meta_image[i] =
                    (uint16_t)(((int)sub[i * 4] << 8) | sub[i * 4 + 1]);
                if (meta_image[i] + 1 > num_groups) num_groups = meta_image[i] + 1;
            }
        }

        int green_alpha = 256 + 24 + (cache_bits ? (1 << cache_bits) : 0);
        std::vector<Huffman> trees((size_t)num_groups * 5);
        for (int g = 0; g < num_groups; g++) {
            const int sizes[5] = {green_alpha, 256, 256, 256, 40};
            for (int j = 0; j < 5; j++)
                if (!read_huffman_code(sizes[j], trees[g * 5 + j])) return false;
        }

        std::vector<uint32_t> cache;
        if (cache_bits) cache.assign(1u << cache_bits, 0);

        long num_px = (long)w * h;
        long index = 0;
        long next_block = 0;
        uint32_t mask = meta_bits ? ((1u << meta_bits) - 1) : 0xFFFFFFFFu;
        const Huffman* g_tree = &trees[0];
        const Huffman* group = &trees[0];

        auto cache_insert = [&](uint32_t r, uint32_t g, uint32_t b, uint32_t a) {
            if (!cache_bits) return;
            uint32_t argb = (a << 24) | (r << 16) | (g << 8) | b;
            uint32_t idx2 = (uint32_t)(0x1e35a7bdu * argb) >> (32 - cache_bits);
            cache[idx2] = argb;
        };

        while (index < num_px) {
            br.fill();
            if (br.error) return false;
            if (index >= next_block) {
                long x = index % w;
                long y = index / w;
                long nb = (x | mask);
                if (nb > w - 1) nb = w - 1;
                next_block = nb + y * w + 1;
                int gi = 0;
                if (meta_bits)
                    gi = meta_image[(y >> meta_bits) * hx + (x >> meta_bits)];
                group = &trees[(size_t)gi * 5];
                g_tree = group;
                // solid-fill fast path
                if (group[0].single && group[1].single && group[2].single &&
                    group[3].single) {
                    int code = group[0].single_sym;
                    if (code < 256) {
                        long n = meta_bits ? (next_block - index) : (num_px - index);
                        uint8_t px[4] = {(uint8_t)group[1].single_sym, (uint8_t)code,
                                         (uint8_t)group[2].single_sym,
                                         (uint8_t)group[3].single_sym};
                        for (long i2 = 0; i2 < n; i2++)
                            memcpy(out + (index + i2) * 4, px, 4);
                        cache_insert(px[0], px[1], px[2], px[3]);
                        index += n;
                        continue;
                    }
                }
            }
            int code = g_tree[0].read_symbol(br);
            if (br.error) return false;
            if (code < 256) {
                int g2 = code;
                int r2 = group[1].read_symbol(br);
                int b2 = group[2].read_symbol(br);
                if (br.nbits < 15) br.fill();
                int a2 = group[3].read_symbol(br);
                uint8_t* p = out + index * 4;
                p[0] = (uint8_t)r2;
                p[1] = (uint8_t)g2;
                p[2] = (uint8_t)b2;
                p[3] = (uint8_t)a2;
                cache_insert(r2, g2, b2, a2);
                index++;
            } else if (code < 280) {
                int length = prefix_value(code - 256);
                int dist_sym = group[4].read_symbol(br);
                if (br.error) return false;
                int dist_code = prefix_value(dist_sym);
                long dist;
                if (dist_code > 120) {
                    dist = dist_code - 120;
                } else {
                    long d = DIST_MAP[dist_code - 1][0] +
                             (long)DIST_MAP[dist_code - 1][1] * w;
                    dist = d < 1 ? 1 : d;
                }
                if (index < dist || num_px - index < length) return false;
                uint8_t* dst = out + index * 4;
                const uint8_t* src = out + (index - dist) * 4;
                for (long i2 = 0; i2 < (long)length * 4; i2++) dst[i2] = src[i2];
                if (cache_bits) {
                    for (int i2 = 0; i2 < length; i2++)
                        cache_insert(dst[i2 * 4], dst[i2 * 4 + 1], dst[i2 * 4 + 2],
                                     dst[i2 * 4 + 3]);
                }
                index += length;
            } else {
                if (!cache_bits) return false;
                uint32_t argb = cache[code - 280];
                uint8_t* p = out + index * 4;
                p[0] = (uint8_t)(argb >> 16);
                p[1] = (uint8_t)(argb >> 8);
                p[2] = (uint8_t)argb;
                p[3] = (uint8_t)(argb >> 24);
                index++;
            }
        }
        return true;
    }

    // ---- inverse transforms ----
    static uint8_t avg2(uint8_t a, uint8_t b) { return (uint8_t)(((int)a + b) / 2); }

    static uint8_t clamp_full(int a, int b, int c) {
        int v = a + b - c;
        return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
    static uint8_t clamp_half(int a, int b) {
        int d = a - b;
        int half = d >= 0 ? d / 2 : -((-d) / 2);
        int v = a + half;
        return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
    }

    void inverse_predictor(uint8_t* img, int w, int h, int size_bits,
                           const uint8_t* pred_data, int block_w) {
        img[3] = (uint8_t)(img[3] + 255);
        for (int i = 4; i < w * 4; i++) img[i] = (uint8_t)(img[i] + img[i - 4]);
        for (int y = 1; y < h; y++)
            for (int c = 0; c < 4; c++)
                img[(size_t)y * w * 4 + c] =
                    (uint8_t)(img[(size_t)y * w * 4 + c] + img[(size_t)(y - 1) * w * 4 + c]);

        for (int y = 1; y < h; y++) {
            uint8_t* row = img + (size_t)y * w * 4;
            const uint8_t* prow = row - (size_t)w * 4;
            for (int bx = 0; bx < block_w; bx++) {
                int mode = pred_data[((size_t)(y >> size_bits) * block_w + bx) * 4 + 1];
                int xs = bx << size_bits;
                if (xs < 1) xs = 1;
                int xe = (bx + 1) << size_bits;
                if (xe > w) xe = w;
                for (int x = xs; x < xe; x++) {
                    uint8_t* p = row + (size_t)x * 4;
                    const uint8_t* L = p - 4;
                    const uint8_t* T = prow + (size_t)x * 4;
                    const uint8_t* TL = T - 4;
                    const uint8_t* TR = (x + 1 < w) ? T + 4 : row;  // wraps to (y,0)
                    switch (mode) {
                        case 0:
                            p[3] = (uint8_t)(p[3] + 255);
                            break;
                        case 1:
                            for (int c = 0; c < 4; c++) p[c] = (uint8_t)(p[c] + L[c]);
                            break;
                        case 2:
                            for (int c = 0; c < 4; c++) p[c] = (uint8_t)(p[c] + T[c]);
                            break;
                        case 3:
                            for (int c = 0; c < 4; c++) p[c] = (uint8_t)(p[c] + TR[c]);
                            break;
                        case 4:
                            for (int c = 0; c < 4; c++) p[c] = (uint8_t)(p[c] + TL[c]);
                            break;
                        case 5:
                            for (int c = 0; c < 4; c++)
                                p[c] = (uint8_t)(p[c] + avg2(avg2(L[c], TR[c]), T[c]));
                            break;
                        case 6:
                            for (int c = 0; c < 4; c++)
                                p[c] = (uint8_t)(p[c] + avg2(L[c], TL[c]));
                            break;
                        case 7:
                            for (int c = 0; c < 4; c++)
                                p[c] = (uint8_t)(p[c] + avg2(L[c], T[c]));
                            break;
                        case 8:
                            for (int c = 0; c < 4; c++)
                                p[c] = (uint8_t)(p[c] + avg2(TL[c], T[c]));
                            break;
                        case 9:
                            for (int c = 0; c < 4; c++)
                                p[c] = (uint8_t)(p[c] + avg2(T[c], TR[c]));
                            break;
                        case 10:
                            for (int c = 0; c < 4; c++)
                                p[c] = (uint8_t)(p[c] +
                                                 avg2(avg2(L[c], TL[c]), avg2(T[c], TR[c])));
                            break;
                        case 11: {
                            int pl = 0, pt = 0;
                            for (int c = 0; c < 4; c++) {
                                int pr = (int)L[c] + T[c] - TL[c];
                                pl += pr > L[c] ? pr - L[c] : L[c] - pr;
                                pt += pr > T[c] ? pr - T[c] : T[c] - pr;
                            }
                            const uint8_t* s = pl < pt ? L : T;
                            for (int c = 0; c < 4; c++) p[c] = (uint8_t)(p[c] + s[c]);
                            break;
                        }
                        case 12:
                            for (int c = 0; c < 4; c++)
                                p[c] = (uint8_t)(p[c] + clamp_full(L[c], T[c], TL[c]));
                            break;
                        case 13:
                            for (int c = 0; c < 4; c++) {
                                int a = ((int)L[c] + T[c]) / 2;
                                p[c] = (uint8_t)(p[c] + clamp_half(a, TL[c]));
                            }
                            break;
                        default:
                            break;
                    }
                }
            }
        }
    }
};

}  // namespace vp8l

extern "C" {

int vp8l_get_dims(const uint8_t* data, int len, int32_t* out_w, int32_t* out_h) {
    vp8l::BitReader br;
    br.init(data, len);
    if (br.read(8) != 0x2f) return -1;
    *out_w = (int32_t)br.read(14) + 1;
    *out_h = (int32_t)br.read(14) + 1;
    if (br.error) return -1;  // header shorter than 5 bytes: dims read from padding
    return 0;
}

// Entropy-only VP8L decode: header + transform sub-images + main symbol
// stream, WITHOUT applying the inverse transforms (the device pipeline
// applies them batched — see webp_tpu/decode/vp8l_device.py).
//   out_buf:   caller-allocated width*height*4 (transformed width <= width)
//   out_meta:  int32 [1 + 4*4]: n_transforms, then per transform in stream
//              order (type, size_bits, table_size, data_len)
//   out_tdata: transform sub-image bytes, concatenated in stream order
// Returns the transformed width (>0) or a negative error code.
int vp8l_decode_entropy(const uint8_t* data, int len, int32_t width,
                        int32_t height, int implicit, uint8_t* out_buf,
                        int32_t* out_meta, uint8_t* out_tdata, int tdata_cap) {
    vp8l::Decoder dec;
    dec.br.init(data, len);
    int w = width, h = height;
    if (!implicit) {
        if (dec.br.read(8) != 0x2f) return -1;
        w = (int)dec.br.read(14) + 1;
        h = (int)dec.br.read(14) + 1;
        if (w != width || h != height) return -2;
        dec.br.read(1);
        if (dec.br.read(3) != 0) return -3;
    }

    bool seen[4] = {false, false, false, false};
    int xsize = w;
    int n = 0;
    int tdata_off = 0;
    while (dec.br.read(1) == 1) {
        int ttype = (int)dec.br.read(2);
        if (seen[ttype] || n >= 4) return -4;
        seen[ttype] = true;
        int size_bits = 0, table_size = 0, data_len = 0;
        if (ttype == 0 || ttype == 1) {
            size_bits = (int)dec.br.read(3) + 2;
            int bw = dec.subsample(xsize, size_bits);
            int bh = dec.subsample(h, size_bits);
            data_len = bw * bh * 4;
            if (tdata_off + data_len > tdata_cap) return -9;
            if (!dec.decode_stream(bw, bh, false, out_tdata + tdata_off)) return -5;
        } else if (ttype == 3) {
            table_size = (int)dec.br.read(8) + 1;
            data_len = table_size * 4;
            if (tdata_off + data_len > tdata_cap) return -9;
            uint8_t* pal = out_tdata + tdata_off;
            if (!dec.decode_stream(table_size, 1, false, pal)) return -6;
            for (int i = 4; i < data_len; i++)
                pal[i] = (uint8_t)(pal[i] + pal[i - 4]);
            int bits = table_size <= 2 ? 3 : (table_size <= 4 ? 2 : (table_size <= 16 ? 1 : 0));
            xsize = dec.subsample(xsize, bits);
        }
        out_meta[1 + n * 4 + 0] = ttype;
        out_meta[1 + n * 4 + 1] = size_bits;
        out_meta[1 + n * 4 + 2] = table_size;
        out_meta[1 + n * 4 + 3] = data_len;
        tdata_off += data_len;
        n++;
    }
    out_meta[0] = n;
    if (!dec.decode_stream(xsize, h, true, out_buf)) return -7;
    return xsize;
}

// Full VP8L decode to RGBA. `implicit` != 0 means no header (ALPH payload).
// Returns 0 on success.
int vp8l_decode(const uint8_t* data, int len, int32_t width, int32_t height,
                int implicit, uint8_t* out_rgba) {
    vp8l::Decoder dec;
    dec.br.init(data, len);
    int w = width, h = height;
    if (!implicit) {
        if (dec.br.read(8) != 0x2f) return -1;
        w = (int)dec.br.read(14) + 1;
        h = (int)dec.br.read(14) + 1;
        if (w != width || h != height) return -2;
        dec.br.read(1);
        if (dec.br.read(3) != 0) return -3;
    }

    // Transforms.
    struct Transform {
        int type;
        int size_bits = 0;
        int table_size = 0;
        std::vector<uint8_t> data;
    };
    std::vector<Transform> transforms;
    bool seen[4] = {false, false, false, false};
    int xsize = w;
    while (dec.br.read(1) == 1) {
        int ttype = (int)dec.br.read(2);
        if (seen[ttype]) return -4;
        seen[ttype] = true;
        Transform t;
        t.type = ttype;
        if (ttype == 0 || ttype == 1) {
            t.size_bits = (int)dec.br.read(3) + 2;
            int bw = dec.subsample(xsize, t.size_bits);
            int bh = dec.subsample(h, t.size_bits);
            t.data.resize((size_t)bw * bh * 4);
            if (!dec.decode_stream(bw, bh, false, t.data.data())) return -5;
        } else if (ttype == 3) {
            t.table_size = (int)dec.br.read(8) + 1;
            t.data.resize((size_t)t.table_size * 4);
            if (!dec.decode_stream(t.table_size, 1, false, t.data.data())) return -6;
            // delta-decode palette
            for (size_t i = 4; i < t.data.size(); i++)
                t.data[i] = (uint8_t)(t.data[i] + t.data[i - 4]);
            int bits = t.table_size <= 2 ? 3 : (t.table_size <= 4 ? 2 : (t.table_size <= 16 ? 1 : 0));
            xsize = dec.subsample(xsize, bits);
        }
        transforms.push_back(std::move(t));
    }

    std::vector<uint8_t> buf((size_t)xsize * h * 4);
    if (!dec.decode_stream(xsize, h, true, buf.data())) return -7;

    int width_now = xsize;
    for (int i = (int)transforms.size() - 1; i >= 0; i--) {
        Transform& t = transforms[i];
        if (t.type == 0) {
            int bw = dec.subsample(width_now, t.size_bits);
            dec.inverse_predictor(buf.data(), width_now, h, t.size_bits, t.data.data(), bw);
        } else if (t.type == 1) {
            int bw = dec.subsample(width_now, t.size_bits);
            for (int y = 0; y < h; y++) {
                uint8_t* row = buf.data() + (size_t)y * width_now * 4;
                const uint8_t* trow = t.data.data() + (size_t)(y >> t.size_bits) * bw * 4;
                for (int x = 0; x < width_now; x++) {
                    const uint8_t* tf = trow + (size_t)(x >> t.size_bits) * 4;
                    int g = (int8_t)row[x * 4 + 1];
                    int r = row[x * 4] + (((int8_t)tf[2] * g) >> 5);
                    row[x * 4] = (uint8_t)r;
                    int b = row[x * 4 + 2] + (((int8_t)tf[1] * g) >> 5) +
                            (((int8_t)tf[0] * (int8_t)(uint8_t)r) >> 5);
                    row[x * 4 + 2] = (uint8_t)b;
                }
            }
        } else if (t.type == 2) {
            for (size_t p = 0; p < buf.size(); p += 4) {
                buf[p] = (uint8_t)(buf[p] + buf[p + 1]);
                buf[p + 2] = (uint8_t)(buf[p + 2] + buf[p + 1]);
            }
        } else if (t.type == 3) {
            std::vector<uint8_t> table(256 * 4, 0);
            memcpy(table.data(), t.data.data(), t.data.size());
            if (t.table_size > 16) {
                std::vector<uint8_t> outp((size_t)w * h * 4);
                for (long p = 0; p < (long)w * h; p++) {
                    int idx = buf[p * 4 + 1];
                    memcpy(&outp[p * 4], &table[(size_t)idx * 4], 4);
                }
                buf.swap(outp);
                width_now = w;
            } else {
                int wbits = t.table_size <= 2 ? 3 : (t.table_size <= 4 ? 2 : 1);
                int per = 1 << wbits;
                int bpp = 8 >> wbits;
                int msk = (1 << bpp) - 1;
                std::vector<uint8_t> outp((size_t)w * h * 4);
                for (int y = 0; y < h; y++) {
                    const uint8_t* prow = buf.data() + (size_t)y * width_now * 4;
                    uint8_t* orow = outp.data() + (size_t)y * w * 4;
                    for (int x = 0; x < w; x++) {
                        int packed = prow[(size_t)(x >> wbits) * 4 + 1];
                        int idx = (packed >> ((x & (per - 1)) * bpp)) & msk;
                        if (idx >= t.table_size)
                            memset(orow + (size_t)x * 4, 0, 4);
                        else
                            memcpy(orow + (size_t)x * 4, &table[(size_t)idx * 4], 4);
                    }
                }
                buf.swap(outp);
                width_now = w;
            }
        }
    }
    if (width_now != w) return -8;
    memcpy(out_rgba, buf.data(), (size_t)w * h * 4);
    return 0;
}

// ---------------------------------------------------------------------------
// Encoder-side greedy LZ77 (hash-chain matcher over packed ARGB pixels).
//
// The python encoder (webp_tpu/encode/vp8l.py) vectorizes histograms, tree
// construction and bit packing; only the inherently serial match search runs
// here. Greedy with a one-pixel lazy check, 1<<20 window (the VP8L distance
// prefix alphabet's reach), min match length 3.
// ---------------------------------------------------------------------------

// Tokenize: emits (len, dist) pairs per token in stream order.
//   len == 1, dist == 0  -> literal (one pixel)
//   len >= 2, dist >= 1  -> backref copy
// Returns the token count, or -1 if `cap` is too small.
int vp8l_lz77(const uint32_t* px, int n, int32_t* out_len, int32_t* out_dist,
              int cap, int optimal) {
    // Distance cap: plane code dist+120 must fit the 40-symbol prefix
    // alphabet (max encodable value is 2^20).
    const int WINDOW = (1 << 20) - 120;
    const int MIN_LEN = 3;
    const int MAX_LEN = 4096;
    const int HASH_BITS = 18;
    const int HASH_SIZE = 1 << HASH_BITS;
    const int MAX_CHAIN = 64;

    std::vector<int32_t> head(HASH_SIZE, -1);
    std::vector<int32_t> prev(n, -1);

    auto hash_at = [&](int i) -> uint32_t {
        // two-pixel hash (matches need >= MIN_LEN anyway)
        uint64_t v = ((uint64_t)px[i] << 32) | px[i + 1];
        return (uint32_t)((v * 0x9E3779B185EBCA87ull) >> (64 - HASH_BITS));
    };

    auto match_len = [&](int a, int b, int max_len) {
        int l = 0;
        while (l < max_len && px[a + l] == px[b + l]) l++;
        return l;
    };

    // Short matches at far distances cost more to code (distance prefix +
    // up to 19 extra bits) than the literals they replace; scale the
    // minimum useful length with distance.
    auto min_len_for = [](int dist) {
        if (dist <= 128) return 3;
        if (dist <= 16384) return 4;
        return 5;
    };

    auto find_match = [&](int i, int* best_dist) -> int {
        if (i + 1 >= n) return 0;
        int best = 0;
        int max_len = n - i < MAX_LEN ? n - i : MAX_LEN;
        int lim = i - WINDOW;
        int cand = head[hash_at(i)];
        int chain = 0;
        while (cand >= 0 && cand > lim && chain < MAX_CHAIN) {
            int l = match_len(cand, i, max_len);
            if (l > best && l >= min_len_for(i - cand)) {
                best = l;
                *best_dist = i - cand;
                if (l >= max_len) break;
            }
            cand = prev[cand];
            chain++;
        }
        // distance-1 runs are free to find and common after transforms
        if (i > 0 && px[i - 1] == px[i]) {
            int l = match_len(i - 1, i, max_len);
            if (l > best) { best = l; *best_dist = 1; }
        }
        return best;
    };

    auto insert = [&](int i) {
        if (i + 1 < n) {
            uint32_t hh = hash_at(i);
            prev[i] = head[hh];
            head[hh] = i;
        }
    };

    if (optimal && n >= 64) {
        // Two-pass cost-based parse: a greedy pass builds symbol histograms,
        // whose -log2 frequencies then drive a forward shortest-path DP over
        // (literal | a few match-length candidates) edges.
        std::vector<int32_t> glen(n), gdist(n);
        int gn = 0;
        {
            int i = 0;
            while (i < n) {
                int dist = 0;
                int len = find_match(i, &dist);
                if (len >= MIN_LEN) {
                    glen[gn] = len; gdist[gn] = dist; gn++;
                    for (int k = i; k < i + len && k < n; k++) insert(k);
                    i += len;
                } else {
                    glen[gn] = 1; gdist[gn] = 0; gn++;
                    insert(i);
                    i += 1;
                }
            }
        }
        // Histograms from the greedy pass (literal channel bytes; length and
        // distance prefix symbols).
        auto prefix_sym = [](int v) {
            if (v <= 4) return v - 1;
            int x = v - 1, hi = 0;
            while ((2 << hi) <= x) hi++;
            hi--;
            return 2 * hi + ((x >> (hi ? hi - 1 : 0)) & 1) + (hi ? 2 : 0);
        };
        // simpler exact prefix symbol + extra-bit count
        auto sym_eb = [](int v, int* eb) {
            if (v <= 4) { *eb = 0; return v - 1; }
            int x = v - 1;
            int hi = 31 - __builtin_clz(x);
            int second = (x >> (hi - 1)) & 1;
            *eb = hi - 1;
            return 2 * hi + second;
        };
        (void)prefix_sym;
        double hg[256] = {0}, hr[256] = {0}, hb[256] = {0}, ha[256] = {0};
        double hl[24] = {0}, hd[40] = {0};
        {
            int pos = 0;
            for (int t = 0; t < gn; t++) {
                if (glen[t] == 1) {
                    uint32_t p = px[pos];
                    hr[(p >> 16) & 0xFF]++; hg[(p >> 8) & 0xFF]++;
                    hb[p & 0xFF]++; ha[(p >> 24) & 0xFF]++;
                } else {
                    int eb;
                    hl[sym_eb(glen[t], &eb)]++;
                    int pc = gdist[t] > 120 ? gdist[t] + 120 : gdist[t];  // approx
                    hd[sym_eb(pc > (1 << 20) ? (1 << 20) : pc, &eb) % 40]++;
                }
                pos += glen[t];
            }
        }
        auto costs_of = [](double* h, int m, std::vector<double>& out) {
            double tot = 0;
            for (int i = 0; i < m; i++) tot += h[i];
            out.resize(m);
            for (int i = 0; i < m; i++) {
                double p = (h[i] + 0.5) / (tot + 0.5 * m);
                out[i] = -std::log2(p);
            }
        };
        std::vector<double> cg, cr, cb, ca, cl, cd;
        costs_of(hg, 256, cg); costs_of(hr, 256, cr); costs_of(hb, 256, cb);
        costs_of(ha, 256, ca); costs_of(hl, 24, cl); costs_of(hd, 40, cd);

        auto lit_cost = [&](int i) {
            uint32_t p = px[i];
            return cr[(p >> 16) & 0xFF] + cg[(p >> 8) & 0xFF] + cb[p & 0xFF] +
                   ca[(p >> 24) & 0xFF];
        };
        auto match_cost = [&](int len, int dist) {
            int eb1, eb2;
            int ls = sym_eb(len, &eb1);
            int pc = dist > 120 ? dist + 120 : dist;
            if (pc > (1 << 20)) pc = 1 << 20;
            int ds = sym_eb(pc, &eb2) % 40;
            return cl[ls] + eb1 + cd[ds] + eb2;
        };

        // Forward DP. Rebuild the hash state from scratch.
        std::fill(head.begin(), head.end(), -1);
        std::fill(prev.begin(), prev.end(), -1);
        // Distance-1 run lengths, right to left: uniform regions are served
        // exactly by these edges, so the (quadratic there) hash search can
        // skip them without losing parse quality.
        std::vector<int32_t> run1(n + 1, 0);
        for (int i = n - 1; i >= 1; i--) {
            if (px[i] == px[i - 1]) {
                run1[i] = run1[i + 1] + 1;
                if (run1[i] > MAX_LEN) run1[i] = MAX_LEN;
            }
        }

        const double INF = 1e30;
        std::vector<double> best(n + 1, INF);
        std::vector<int32_t> via_len(n + 1, 0), via_dist(n + 1, 0);
        best[0] = 0.0;
        for (int i = 0; i < n; i++) {
            if (best[i] >= INF) { insert(i); continue; }
            double bl = best[i] + lit_cost(i);
            if (bl < best[i + 1]) { best[i + 1] = bl; via_len[i + 1] = 1; via_dist[i + 1] = 0; }

            auto relax = [&](int len, int dist) {
                for (int l = len; l >= MIN_LEN && l >= len - 3; l--) {
                    double c = best[i] + match_cost(l, dist);
                    if (c < best[i + l]) {
                        best[i + l] = c; via_len[i + l] = l; via_dist[i + l] = dist;
                    }
                }
            };
            int r1 = run1[i] > n - i ? n - i : run1[i];
            if (r1 >= MIN_LEN) relax(r1, 1);
            if (r1 < 64) {
                int dist = 0;
                int len = find_match(i, &dist);
                if (len >= MIN_LEN) relax(len, dist);
            }
            insert(i);
        }
        // Backtrack into forward order.
        std::vector<int32_t> rlen, rdist;
        for (int i = n; i > 0;) {
            rlen.push_back(via_len[i]);
            rdist.push_back(via_dist[i]);
            i -= via_len[i];
        }
        int nt = (int)rlen.size();
        if (nt > cap) return -1;
        for (int t = 0; t < nt; t++) {
            out_len[t] = rlen[nt - 1 - t];
            out_dist[t] = rdist[nt - 1 - t];
        }
        return nt;
    }

    int nt = 0;
    int i = 0;
    while (i < n) {
        int dist = 0;
        int len = find_match(i, &dist);
        if (len >= MIN_LEN) {
            // lazy: a one-longer match starting at i+1 wins
            int dist2 = 0, len2 = 0;
            bool probed = (i + 1 < n);
            if (probed) {
                insert(i);
                len2 = find_match(i + 1, &dist2);
            }
            if (len2 > len + 1) {
                if (nt >= cap) return -1;
                out_len[nt] = 1; out_dist[nt] = 0; nt++;  // literal at i
                i += 1;
                continue;  // re-search at i (i already inserted)
            }
            if (nt >= cap) return -1;
            out_len[nt] = len; out_dist[nt] = dist; nt++;
            // insert the positions covered by the match (i itself was
            // already inserted by the lazy probe when it ran)
            for (int k = i + (probed ? 1 : 0); k < i + len && k < n; k++)
                insert(k);
            i += len;
        } else {
            if (nt >= cap) return -1;
            out_len[nt] = 1; out_dist[nt] = 0; nt++;
            insert(i);
            i += 1;
        }
    }
    return nt;
}

// Limited-length Huffman code lengths for K groups of concatenated
// alphabet segments (the VP8L encoder's 5 trees per entropy group).
// Mirrors webp_tpu/encode/vp8l.py build_code_lengths exactly (heap with
// (freq, id) tie-break, counts-based limit fixup, stable-by-frequency
// reassignment) so the native and python paths emit identical lengths.
//   hist: K*A int64, offs: n_seg+1 int32 (segment s = [offs[s], offs[s+1]))
//   out:  K*A uint8 lengths (0 = unused symbol / <2-symbol segment)
int vp8l_huffman_lengths(const int64_t* hist, int K, int A,
                         const int32_t* offs, int n_seg, int limit,
                         uint8_t* out) {
    if (limit <= 0 || limit > 30) return -1;
    std::vector<std::pair<int64_t, int> > heap;   // min-heap of (freq, id)
    std::vector<int> parent;
    std::vector<int> used;
    std::vector<int> depth;
    auto cmp = [](const std::pair<int64_t, int>& a,
                  const std::pair<int64_t, int>& b) { return a > b; };
    for (int k = 0; k < K; k++) {
        for (int s = 0; s < n_seg; s++) {
            const int lo = offs[s], hi = offs[s + 1];
            const int n = hi - lo;
            const int64_t* f = hist + (int64_t)k * A + lo;
            uint8_t* o = out + (int64_t)k * A + lo;
            for (int i = 0; i < n; i++) o[i] = 0;
            used.clear();
            for (int i = 0; i < n; i++)
                if (f[i] > 0) used.push_back(i);
            if (used.size() <= 1) continue;
            // Infeasible: no depth<=limit prefix code exists.  Without this
            // guard the Kraft fixup loop walks counts[] out of bounds and
            // corrupts the heap.  In-contract callers never hit it.
            if (limit < 30 && (int64_t)used.size() > ((int64_t)1 << limit))
                return -1;
            heap.clear();
            parent.assign(2 * n, -1);
            for (int i : used) heap.push_back({f[i], i});
            std::make_heap(heap.begin(), heap.end(), cmp);
            int next_id = n;
            while (heap.size() > 1) {
                std::pop_heap(heap.begin(), heap.end(), cmp);
                auto a = heap.back(); heap.pop_back();
                std::pop_heap(heap.begin(), heap.end(), cmp);
                auto b = heap.back(); heap.pop_back();
                parent[a.second] = next_id;
                parent[b.second] = next_id;
                heap.push_back({a.first + b.first, next_id});
                std::push_heap(heap.begin(), heap.end(), cmp);
                next_id++;
            }
            depth.assign(n, 0);
            int maxd = 0;
            for (int i : used) {
                int d = 0, x = i;
                while (parent[x] >= 0) { x = parent[x]; d++; }
                depth[i] = d;
                if (d > maxd) maxd = d;
            }
            if (maxd <= limit) {
                for (int i : used) o[i] = (uint8_t)depth[i];
                continue;
            }
            // Kraft fixup, then reassign by ascending frequency (stable).
            std::vector<int64_t> counts(limit + 1, 0);
            for (int i : used) counts[depth[i] < limit ? depth[i] : limit]++;
            int64_t total = 0;
            for (int i = 1; i <= limit; i++)
                total += counts[i] << (limit - i);
            while (total > ((int64_t)1 << limit)) {
                int i = limit - 1;
                while (counts[i] == 0) i--;
                counts[i]--; counts[limit]--; counts[i + 1] += 2; total--;
            }
            std::vector<int> order(used);
            std::stable_sort(order.begin(), order.end(),
                             [&](int a2, int b2) { return f[a2] < f[b2]; });
            int ln = limit;
            for (int i : order) {
                while (counts[ln] == 0) ln--;
                o[i] = (uint8_t)ln;
                counts[ln]--;
            }
        }
    }
    return 0;
}

// Exact color-cache hit mask: pixel i hits iff the most recent earlier
// pixel in its hash bucket holds the same ARGB value (decode inserts every
// pixel, so the bucket's last writer decides).  out_hits: n uint8,
// out_hash: n int32.
int vp8l_cache_hits(const uint32_t* packed, int n, int bits,
                    uint8_t* out_hits, int32_t* out_hash) {
    if (bits < 1 || bits > 11) return -1;
    std::vector<uint32_t> last(((size_t)1 << bits), 0);
    std::vector<uint8_t> seen(((size_t)1 << bits), 0);
    for (int i = 0; i < n; i++) {
        const uint32_t v = packed[i];
        const uint32_t h = (uint32_t)(0x1E35A7BDu * v) >> (32 - bits);
        out_hash[i] = (int32_t)h;
        out_hits[i] = seen[h] && last[h] == v;
        last[h] = v;
        seen[h] = 1;
    }
    return 0;
}

// Best-of-14 VP8L predictor selection per tile + final wrapped residual
// (subtract-green domain), mirroring _pick_predictors in
// webp_tpu/encode/vp8l.py (incl. its TR convention at the last column and
// the row-0 = L / col-0 = T forced-mode residual overrides).
//   u: h*w*4 uint8, cost_lut: 129 uint8 (1/32-bit units)
//   out_modes: bh*bw uint8 (bh/bw = ceil(h or w >> size_bits))
//   out_res:   h*w*4 uint8
int vp8l_pick_predictors(const uint8_t* u, int w, int h, int size_bits,
                         const uint8_t* cost_lut, uint8_t* out_modes,
                         uint8_t* out_res) {
    const int S = 1 << size_bits;
    const int bw = (w + S - 1) >> size_bits;
    const int bh = (h + S - 1) >> size_bits;
    std::vector<int64_t> cost((size_t)bw * 14, 0);
    auto px = [&](int y, int x, int c) -> int {
        return u[((int64_t)y * w + x) * 4 + c];
    };
    // 14 predictions of channel c at (y, x); edge pixels (y==0 || x==0)
    // never reach here in the cost pass and are overridden in the residual
    // pass, so L/T/TL/TR are always in-bounds except TR's last column.
    int P[14][4];
    auto predict_all = [&](int y, int x) {
        const bool last = (x == w - 1);
        for (int c = 0; c < 4; c++) {
            const int Lv = px(y, x - 1, c);
            const int Tv = px(y - 1, x, c);
            const int TLv = px(y - 1, x - 1, c);
            const int TRv = last ? px(y, 0, c) : px(y - 1, x + 1, c);
            P[0][c] = (c == 3) ? 255 : 0;
            P[1][c] = Lv;
            P[2][c] = Tv;
            P[3][c] = TRv;
            P[4][c] = TLv;
            P[5][c] = ((((Lv + TRv) >> 1) + Tv) >> 1);
            P[6][c] = (Lv + TLv) >> 1;
            P[7][c] = (Lv + Tv) >> 1;
            P[8][c] = (TLv + Tv) >> 1;
            P[9][c] = (Tv + TRv) >> 1;
            P[10][c] = (((Lv + TLv) >> 1) + ((Tv + TRv) >> 1)) >> 1;
            const int p = Lv + Tv - TLv;
            P[12][c] = p < 0 ? 0 : (p > 255 ? 255 : p);
            const int a2 = (Lv + Tv) >> 1;
            const int d = a2 - TLv;
            const int half = d >= 0 ? (d >> 1) : -((-d) >> 1);
            const int v13 = a2 + half;
            P[13][c] = v13 < 0 ? 0 : (v13 > 255 ? 255 : v13);
        }
        // Mode 11 (select) picks L or T per whole pixel.
        int p_left = 0, p_top = 0;
        for (int c = 0; c < 4; c++) {
            const int p = P[1][c] + P[2][c] - P[4][c];
            p_left += p > P[1][c] ? p - P[1][c] : P[1][c] - p;
            p_top += p > P[2][c] ? p - P[2][c] : P[2][c] - p;
        }
        const int sel = (p_left < p_top) ? 1 : 2;
        for (int c = 0; c < 4; c++) P[11][c] = P[sel][c];
    };
    for (int by = 0; by < bh; by++) {
        std::fill(cost.begin(), cost.end(), 0);
        const int y0 = by * S;
        const int y1 = y0 + S < h ? y0 + S : h;
        for (int y = (y0 == 0 ? 1 : y0); y < y1; y++) {
            for (int x = 1; x < w; x++) {
                predict_all(y, x);
                int64_t* cb = &cost[(size_t)(x >> size_bits) * 14];
                for (int m = 0; m < 14; m++) {
                    int csum = 0;
                    for (int c = 0; c < 4; c++) {
                        const int r = (px(y, x, c) - P[m][c]) & 0xFF;
                        csum += cost_lut[r < 256 - r ? r : 256 - r];
                    }
                    cb[m] += csum;
                }
            }
        }
        for (int bx = 0; bx < bw; bx++) {
            const int64_t* cb = &cost[(size_t)bx * 14];
            int best = 0;
            for (int m = 1; m < 14; m++)
                if (cb[m] < cb[best]) best = m;
            out_modes[(int64_t)by * bw + bx] = (uint8_t)best;
        }
    }
    // Residual pass under the chosen modes with forced edge modes.
    for (int y = 0; y < h; y++) {
        const uint8_t* mrow = out_modes + (int64_t)(y >> size_bits) * bw;
        for (int x = 0; x < w; x++) {
            uint8_t* o = out_res + ((int64_t)y * w + x) * 4;
            if (y == 0 && x == 0) {
                for (int c = 0; c < 4; c++)
                    o[c] = (uint8_t)((px(0, 0, c) - (c == 3 ? 255 : 0)) & 0xFF);
            } else if (y == 0) {       // row 0: left predictor
                for (int c = 0; c < 4; c++)
                    o[c] = (uint8_t)((px(0, x, c) - px(0, x - 1, c)) & 0xFF);
            } else if (x == 0) {       // column 0: top predictor
                for (int c = 0; c < 4; c++)
                    o[c] = (uint8_t)((px(y, 0, c) - px(y - 1, 0, c)) & 0xFF);
            } else {
                predict_all(y, x);
                const int m = mrow[x >> size_bits];
                for (int c = 0; c < 4; c++)
                    o[c] = (uint8_t)((px(y, x, c) - P[m][c]) & 0xFF);
            }
        }
    }
    return 0;
}

}  // extern "C"
