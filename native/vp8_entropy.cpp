// VP8 entropy coding hot loops (host side).
//
// The boolean arithmetic coder is inherently serial, so it runs on the host;
// this library implements the per-macroblock entropy passes at native speed:
//   - vp8_entropy_decode: full keyframe parse -> mode/coefficient tensors
//     (bit-exact with webp_tpu/decode/vp8.py, which is the reference).
//   - vp8_token_encode: quantized level blocks -> boolean-coded partition.
//
// Probability/quantizer tables are passed in from Python so the spec data
// stays single-sourced (webp_tpu/common/vp8_tables.py).
//
// Build: g++ -O2 -shared -fPIC -o libwebp_tpu_native.so vp8_entropy.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------- decoder

// 56-bit buffered boolean decoder (model: the reference's wide bit reader,
// /root/reference/src/decoder/bit_reader.rs:16-146).  Layout: the 16-bit
// arithmetic value lives in bits [48..63] of `value`; up to 48 future
// bitstream bits are staged below it, so renormalization is one shift +
// count-leading-zeros instead of a byte-at-a-time loop.  Bit-exact with the
// Python reference decoder (webp_tpu/io/booldec.py), including the
// one-byte-past-end EOF tolerance.
struct BoolDec {
    const uint8_t* data;
    int len;
    int pos;         // next byte to prefetch
    uint64_t value;
    uint32_t range;
    int navail;      // valid future bits below bit 48
    long shifts;     // total renormalization shifts (EOF accounting)

    void init(const uint8_t* d, int l) {
        data = d;
        len = l;
        pos = 0;
        shifts = 0;
        value = 0;
        for (int i = 0; i < 7; i++) {
            uint64_t b = (pos < len) ? data[pos++] : 0;
            value = (value << 8) | b;
        }
        navail = 48;  // b1..b6 staged below the 16-bit window at [48..63]
        range = 255;
    }
    // Consumed bytes mirror the byte-at-a-time reader: 2 at init plus one per
    // 8 renormalization shifts; one byte of zero padding past the end is
    // tolerated (reference near-EOF behavior, decoder/arithmetic.rs:298-303).
    bool is_eof() const { return 2 + (shifts >> 3) > (long)len + 1; }

    inline void refill() {
        while (navail <= 40) {
            uint64_t b = (pos < len) ? data[pos++] : 0;
            value |= b << (40 - navail);
            navail += 8;
        }
    }

    inline int get_bit(int prob) {
        if (navail < 8) refill();
        uint32_t split = 1 + (((range - 1) * (uint32_t)prob) >> 8);
        uint64_t big = (uint64_t)split << 48;
        int bit;
        if (value >= big) {
            bit = 1;
            range -= split;
            value -= big;
        } else {
            bit = 0;
            range = split;
        }
        if (range < 128) {
            int sh = __builtin_clz(range) - 24;
            range <<= sh;
            value <<= sh;
            navail -= sh;
            shifts += sh;
        }
        return bit;
    }
    int get_flag() { return get_bit(128); }
    int get_literal(int n) {
        int v = 0;
        for (int i = 0; i < n; i++) v = (v << 1) | get_bit(128);
        return v;
    }
    int get_signed(int n) {
        if (!get_flag()) return 0;
        int mag = get_literal(n);
        return get_flag() ? -mag : mag;
    }
    int read_tree(const int8_t* tree, const uint8_t* probs) {
        int i = 0;
        for (;;) {
            int t = tree[i + get_bit(probs[i >> 1])];
            if (t <= 0) return -t;
            i = t;
        }
    }
};

const int8_t SEGMENT_TREE[6] = {2, 4, 0, -1, -2, -3};
const int8_t YMODE_TREE[8] = {-4, 2, 4, 6, 0, -1, -2, -3};
const int8_t UV_TREE[6] = {0, 2, -1, 4, -2, -3};
const int8_t BPRED_TREE[18] = {0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9};
const uint8_t YMODE_PROBS[4] = {145, 156, 163, 128};
const uint8_t UV_PROBS[3] = {142, 114, 183};
const uint8_t CAT_PROBS[6][11] = {
    {159, 0},
    {165, 145, 0},
    {173, 148, 140, 0},
    {176, 155, 140, 135, 0},
    {180, 157, 141, 134, 130, 0},
    {254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129},
};
const int CAT_BITS[6] = {1, 2, 3, 4, 5, 11};
const int ZIGZAG[16] = {0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15};
const int COEFF_BANDS[16] = {0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7};

struct Segment {
    int quantizer_level = 0;
    int loopfilter_level = 0;
    bool delta_values = true;
    int ydc = 0, yac = 0, y2dc = 0, y2ac = 0, uvdc = 0, uvac = 0;
};

// Read coefficients for one block; returns has-AC flag (n > first).
// probs layout: [8 bands][3 ctx][11]
// Templated on the output type: the classic path writes dequantized int32;
// the levels path (vp8_entropy_decode16) writes raw int16 levels (dcq=acq=1)
// and lets the device dequantize (halves host memory traffic — the levels
// design; reference dequant-on-read is /root/reference/src/decoder/vp8.rs:949-951).
template <typename T>
static int read_coeffs(BoolDec& bd, const uint8_t* plane_probs, int ctx, int dcq, int acq,
                       int first, T* block, int* error) {
    int n = first;
    const uint8_t* p = plane_probs + (COEFF_BANDS[n] * 3 + ctx) * 11;
    while (n < 16) {
        if (!bd.get_bit(p[0])) break;
        while (!bd.get_bit(p[1])) {
            n += 1;
            if (n >= 16) {
                if (bd.is_eof()) *error = 1;
                return 1;
            }
            p = plane_probs + (COEFF_BANDS[n] * 3 + 0) * 11;
        }
        int v;
        int next_ctx;
        if (!bd.get_bit(p[2])) {
            v = 1;
            next_ctx = 1;
        } else {
            if (!bd.get_bit(p[3])) {
                if (!bd.get_bit(p[4]))
                    v = 2;
                else
                    v = 3 + bd.get_bit(p[5]);
            } else {
                if (!bd.get_bit(p[6])) {
                    if (!bd.get_bit(p[7]))
                        v = 5 + bd.get_bit(159);
                    else
                        v = 7 + 2 * bd.get_bit(165) + bd.get_bit(145);
                } else {
                    int bit1 = bd.get_bit(p[8]);
                    int bit0 = bd.get_bit(p[9 + bit1]);
                    int cat = 2 * bit1 + bit0;
                    int extra = 0;
                    for (int i = 0; i < CAT_BITS[2 + cat]; i++)
                        extra = extra + extra + bd.get_bit(CAT_PROBS[2 + cat][i]);
                    v = 3 + (8 << cat) + extra;
                }
            }
            next_ctx = 2;
        }
        if (bd.get_bit(128)) v = -v;
        int zz = ZIGZAG[n];
        block[zz] = (T)(v * (zz > 0 ? acq : dcq));
        n += 1;
        if (n < 16) p = plane_probs + (COEFF_BANDS[n] * 3 + next_ctx) * 11;
    }
    if (bd.is_eof()) *error = 1;
    return n > first;
}

static void iwht4x4(int32_t* b) {
    for (int i = 0; i < 4; i++) {
        int64_t a1 = (int64_t)b[i] + b[12 + i];
        int64_t b1 = (int64_t)b[4 + i] + b[8 + i];
        int64_t c1 = (int64_t)b[4 + i] - b[8 + i];
        int64_t d1 = (int64_t)b[i] - b[12 + i];
        b[i] = (int32_t)(a1 + b1);
        b[4 + i] = (int32_t)(c1 + d1);
        b[8 + i] = (int32_t)(a1 - b1);
        b[12 + i] = (int32_t)(d1 - c1);
    }
    for (int i = 0; i < 4; i++) {
        int32_t* r = b + i * 4;
        int64_t a1 = (int64_t)r[0] + r[3];
        int64_t b1 = (int64_t)r[1] + r[2];
        int64_t c1 = (int64_t)r[1] - r[2];
        int64_t d1 = (int64_t)r[0] - r[3];
        r[0] = (int32_t)((a1 + b1 + 3) >> 3);
        r[1] = (int32_t)((c1 + d1 + 3) >> 3);
        r[2] = (int32_t)((a1 - b1 + 3) >> 3);
        r[3] = (int32_t)((d1 - c1 + 3) >> 3);
    }
}

// Parsed frame-header state shared by both entropy-pass entry points.
struct FrameHeader {
    int w, h, mbw, mbh;
    int filter_type, filter_level, sharpness, lf_adjust;
    int ref_delta0, mode_delta0;
    bool segments_enabled, segments_update_map;
    uint8_t seg_tree_probs[3];
    Segment segs[4];
    int num_partitions;
    int prob_skip_false;
    uint8_t probs[4 * 8 * 3 * 11];
    BoolDec b;        // partition 0 (modes)
    BoolDec parts[8]; // coefficient partitions
};

// Parse the uncompressed + compressed VP8 frame headers (RFC 6386 §9;
// reference /root/reference/src/decoder/vp8.rs:553-679). Returns 0 on success.
static int parse_frame_header(const uint8_t* data, int len, const uint8_t* default_probs,
                              const uint8_t* update_probs, const int16_t* dc_qtable,
                              const int16_t* ac_qtable, FrameHeader& H) {
    if (len < 10) return -1;
    uint32_t tag = data[0] | (data[1] << 8) | (data[2] << 16);
    if (tag & 1) return -2;
    if (!(data[3] == 0x9d && data[4] == 0x01 && data[5] == 0x2a)) return -3;
    H.w = (data[6] | (data[7] << 8)) & 0x3FFF;
    H.h = (data[8] | (data[9] << 8)) & 0x3FFF;
    int first_part_size = tag >> 5;
    if (10 + first_part_size > len) return -4;
    H.mbw = (H.w + 15) / 16;
    H.mbh = (H.h + 15) / 16;

    BoolDec& b = H.b;
    b.init(data + 10, first_part_size);
    if (b.get_literal(1) != 0) return -5;  // color space
    b.get_literal(1);                      // pixel type

    H.segments_enabled = b.get_flag();
    H.segments_update_map = false;
    H.seg_tree_probs[0] = H.seg_tree_probs[1] = H.seg_tree_probs[2] = 255;
    if (H.segments_enabled) {
        H.segments_update_map = b.get_flag();
        if (b.get_flag()) {
            bool absolute = b.get_flag();
            for (int i = 0; i < 4; i++) H.segs[i].delta_values = !absolute;
            for (int i = 0; i < 4; i++) H.segs[i].quantizer_level = b.get_signed(7);
            for (int i = 0; i < 4; i++) H.segs[i].loopfilter_level = b.get_signed(6);
        }
        if (H.segments_update_map) {
            for (int i = 0; i < 3; i++)
                H.seg_tree_probs[i] = b.get_flag() ? b.get_literal(8) : 255;
        }
    }

    H.filter_type = b.get_flag();
    H.filter_level = b.get_literal(6);
    H.sharpness = b.get_literal(3);
    H.lf_adjust = b.get_flag();
    H.ref_delta0 = 0;
    H.mode_delta0 = 0;
    if (H.lf_adjust) {
        if (b.get_flag()) {
            int rd[4], md[4];
            for (int i = 0; i < 4; i++) rd[i] = b.get_signed(6);
            for (int i = 0; i < 4; i++) md[i] = b.get_signed(6);
            H.ref_delta0 = rd[0];
            H.mode_delta0 = md[0];
        }
    }

    H.num_partitions = 1 << b.get_literal(2);
    const uint8_t* part_base = data + 10 + first_part_size;
    int remaining = len - 10 - first_part_size;
    {
        int sizes[8];
        int total_table = 3 * (H.num_partitions - 1);
        if (total_table > remaining) return -6;
        const uint8_t* ptr = part_base;
        for (int i = 0; i < H.num_partitions - 1; i++) {
            sizes[i] = ptr[0] | (ptr[1] << 8) | (ptr[2] << 16);
            ptr += 3;
        }
        remaining -= total_table;
        for (int i = 0; i < H.num_partitions - 1; i++) {
            if (sizes[i] > remaining) return -7;
            H.parts[i].init(ptr, sizes[i]);
            ptr += sizes[i];
            remaining -= sizes[i];
        }
        H.parts[H.num_partitions - 1].init(ptr, remaining);
    }

    // Quantizer indices (per-segment derivation: vp8.rs:452-504).
    int yac_abs = b.get_literal(7);
    int ydc_d = b.get_signed(4);
    int y2dc_d = b.get_signed(4);
    int y2ac_d = b.get_signed(4);
    int uvdc_d = b.get_signed(4);
    int uvac_d = b.get_signed(4);
    auto clampq = [](int i) { return i < 0 ? 0 : (i > 127 ? 127 : i); };
    int nseg = H.segments_enabled ? 4 : 1;
    for (int i = 0; i < nseg; i++) {
        Segment& sg = H.segs[i];
        int base = H.segments_enabled
                       ? (sg.delta_values ? sg.quantizer_level + yac_abs
                                          : sg.quantizer_level)
                       : yac_abs;
        sg.ydc = dc_qtable[clampq(base + ydc_d)];
        sg.yac = ac_qtable[clampq(base)];
        sg.y2dc = dc_qtable[clampq(base + y2dc_d)] * 2;
        int y2ac = ac_qtable[clampq(base + y2ac_d)] * 155 / 100;
        sg.y2ac = y2ac < 8 ? 8 : y2ac;
        int uvdc = dc_qtable[clampq(base + uvdc_d)];
        sg.uvdc = uvdc > 132 ? 132 : uvdc;
        sg.uvac = ac_qtable[clampq(base + uvac_d)];
    }

    b.get_literal(1);  // refresh entropy probs

    memcpy(H.probs, default_probs, sizeof(H.probs));
    for (int i = 0; i < 4 * 8 * 3 * 11; i++) {
        if (b.get_bit(update_probs[i])) H.probs[i] = b.get_literal(8);
    }

    H.prob_skip_false = -1;
    if (b.get_literal(1) == 1) H.prob_skip_false = b.get_literal(8);
    return 0;
}

static void write_header_out(const FrameHeader& H, int32_t* header_out, int32_t* seg_out) {
    header_out[0] = H.w;
    header_out[1] = H.h;
    header_out[2] = H.mbw;
    header_out[3] = H.mbh;
    header_out[4] = H.filter_type;
    header_out[5] = H.filter_level;
    header_out[6] = H.sharpness;
    header_out[7] = H.lf_adjust;
    header_out[8] = H.ref_delta0;
    header_out[9] = H.mode_delta0;
    header_out[10] = H.segments_enabled;
    header_out[11] = H.segments_update_map;
    header_out[12] = (H.segs[0].delta_values ? 1 : 0) | (H.segs[1].delta_values ? 2 : 0) |
                     (H.segs[2].delta_values ? 4 : 0) | (H.segs[3].delta_values ? 8 : 0);
    for (int i = 0; i < 4; i++) {
        seg_out[i * 8 + 0] = H.segs[i].quantizer_level;
        seg_out[i * 8 + 1] = H.segs[i].loopfilter_level;
        seg_out[i * 8 + 2] = H.segs[i].ydc;
        seg_out[i * 8 + 3] = H.segs[i].yac;
        seg_out[i * 8 + 4] = H.segs[i].y2dc;
        seg_out[i * 8 + 5] = H.segs[i].y2ac;
        seg_out[i * 8 + 6] = H.segs[i].uvdc;
        seg_out[i * 8 + 7] = H.segs[i].uvac;
    }
}

}  // namespace

extern "C" {

// Parse only dimensions (for buffer allocation). Returns 0 on success.
int vp8_parse_dims(const uint8_t* data, int len, int32_t* out_w, int32_t* out_h) {
    if (len < 10) return -1;
    uint32_t tag = data[0] | (data[1] << 8) | (data[2] << 16);
    if (tag & 1) return -2;
    if (!(data[3] == 0x9d && data[4] == 0x01 && data[5] == 0x2a)) return -3;
    *out_w = (data[6] | (data[7] << 8)) & 0x3FFF;
    *out_h = (data[8] | (data[9] << 8)) & 0x3FFF;
    return 0;
}

// Full keyframe entropy decode.
//
// Inputs: bitstream + spec tables. Outputs sized for mbw*mbh macroblocks
// (mbw = ceil(w/16) etc., computed by the caller from vp8_parse_dims):
//   header_out[16]: width,height,mbw,mbh,filter_type,filter_level,sharpness,
//                   lf_adjust,ref_delta0,mode_delta0,segments_enabled,
//                   seg_absdelta (1 = absolute), reserved...
//   seg_out[4*8]: per segment: quantizer_level, loopfilter_level, ydc, yac,
//                 y2dc, y2ac, uvdc, uvac
//   luma_mode[nmb], chroma_mode[nmb], segment_ids[nmb], bpred[nmb*16],
//   skipped[nmb], non_zero[nmb], has_ac[nmb*24], coeffs[nmb*24*16]
// Returns 0 on success, negative error code otherwise.
int vp8_entropy_decode(const uint8_t* data, int len, const uint8_t* default_probs,
                       const uint8_t* update_probs, const uint8_t* bpred_probs,
                       const int16_t* dc_qtable, const int16_t* ac_qtable,
                       int32_t* header_out, int32_t* seg_out, int32_t* luma_mode,
                       int32_t* chroma_mode, int32_t* segment_ids, int32_t* bpred,
                       uint8_t* skipped, uint8_t* non_zero, uint8_t* has_ac, int32_t* coeffs) {
    FrameHeader H;
    int rc = parse_frame_header(data, len, default_probs, update_probs,
                                dc_qtable, ac_qtable, H);
    if (rc) return rc;
    int mbw = H.mbw, mbh = H.mbh;
    int nmb = mbw * mbh;
    BoolDec& b = H.b;
    BoolDec* parts = H.parts;
    const uint8_t* probs = H.probs;
    const Segment* segs = H.segs;
    bool segments_enabled = H.segments_enabled;
    bool segments_update_map = H.segments_update_map;
    const uint8_t* seg_tree_probs = H.seg_tree_probs;
    int num_partitions = H.num_partitions;
    int prob_skip_false = H.prob_skip_false;

    // Per-MB entropy loop.
    int32_t* top_bpred = new int32_t[mbw * 4];
    int32_t* top_c = new int32_t[mbw * 9];
    for (int i = 0; i < mbw * 4; i++) top_bpred[i] = 0;
    for (int i = 0; i < mbw * 9; i++) top_c[i] = 0;
    int error = 0;

    for (int mby = 0; mby < mbh && !error; mby++) {
        BoolDec& part = parts[mby % num_partitions];
        int32_t left_bpred[4] = {0, 0, 0, 0};
        int32_t left_c[9] = {0};
        for (int mbx = 0; mbx < mbw && !error; mbx++) {
            int i = mby * mbw + mbx;
            int seg_id = 0;
            if (segments_enabled && segments_update_map)
                seg_id = b.read_tree(SEGMENT_TREE, seg_tree_probs);
            segment_ids[i] = seg_id;
            int skip = 0;
            if (prob_skip_false >= 0) skip = b.get_bit(prob_skip_false);
            skipped[i] = (uint8_t)skip;

            int luma = b.read_tree(YMODE_TREE, YMODE_PROBS);
            luma_mode[i] = luma;
            if (luma == 4) {
                for (int sy = 0; sy < 4; sy++) {
                    for (int sx = 0; sx < 4; sx++) {
                        int above = top_bpred[mbx * 4 + sx];
                        int left = left_bpred[sy];
                        int m = b.read_tree(BPRED_TREE,
                                            bpred_probs + (above * 10 + left) * 9);
                        bpred[i * 16 + sy * 4 + sx] = m;
                        top_bpred[mbx * 4 + sx] = m;
                        left_bpred[sy] = m;
                    }
                }
            } else {
                static const int LUMA_TO_B[4] = {0, 2, 3, 1};  // DC,VE,HE,TM
                int bm = LUMA_TO_B[luma];
                for (int k = 0; k < 12; k++) bpred[i * 16 + k] = 0;
                for (int k = 12; k < 16; k++) bpred[i * 16 + k] = bm;
                for (int sy = 0; sy < 4; sy++) left_bpred[sy] = bm;
                for (int sx = 0; sx < 4; sx++) top_bpred[mbx * 4 + sx] = bm;
            }
            chroma_mode[i] = b.read_tree(UV_TREE, UV_PROBS);

            int32_t* mb_coeffs = coeffs + (size_t)i * 24 * 16;
            uint8_t* mb_has_ac = has_ac + (size_t)i * 24;
            memset(mb_coeffs, 0, 24 * 16 * sizeof(int32_t));
            memset(mb_has_ac, 0, 24);

            if (skip) {
                if (luma != 4) {
                    left_c[0] = 0;
                    top_c[mbx * 9] = 0;
                }
                for (int k = 1; k < 9; k++) {
                    left_c[k] = 0;
                    top_c[mbx * 9 + k] = 0;
                }
                non_zero[i] = 0;
                continue;
            }

            const Segment& sg = segs[seg_id];
            int plane, first;
            int nz = 0;
            if (luma != 4) {
                int ctx = top_c[mbx * 9] + left_c[0];
                int32_t y2[16];
                memset(y2, 0, sizeof(y2));
                int n = read_coeffs(part, probs + 1 * 8 * 3 * 11, ctx, sg.y2dc, sg.y2ac, 0,
                                    y2, &error);
                left_c[0] = top_c[mbx * 9] = n;
                iwht4x4(y2);
                for (int k = 0; k < 16; k++) mb_coeffs[k * 16] = y2[k];
                plane = 0;
                first = 1;
            } else {
                plane = 3;
                first = 0;
            }

            for (int y = 0; y < 4; y++) {
                int left = left_c[y + 1];
                for (int x = 0; x < 4; x++) {
                    int bi = y * 4 + x;
                    int ctx = top_c[mbx * 9 + x + 1] + left;
                    int32_t* blk = mb_coeffs + bi * 16;
                    int32_t save_dc = blk[0];
                    int n = read_coeffs(part, probs + plane * 8 * 3 * 11, ctx, sg.ydc,
                                        sg.yac, first, blk, &error);
                    if (first) blk[0] = save_dc;  // DC comes from Y2
                    mb_has_ac[bi] = (uint8_t)n;
                    if (blk[0] != 0 || n) nz = 1;
                    left = n;
                    top_c[mbx * 9 + x + 1] = n;
                }
                left_c[y + 1] = left;
            }
            for (int half = 0; half < 2; half++) {
                int j = half == 0 ? 5 : 7;
                int base = half == 0 ? 16 : 20;
                for (int y = 0; y < 2; y++) {
                    int left = left_c[y + j];
                    for (int x = 0; x < 2; x++) {
                        int bi = base + y * 2 + x;
                        int ctx = top_c[mbx * 9 + x + j] + left;
                        int32_t* blk = mb_coeffs + bi * 16;
                        int n = read_coeffs(part, probs + 2 * 8 * 3 * 11, ctx, sg.uvdc,
                                            sg.uvac, 0, blk, &error);
                        mb_has_ac[bi] = (uint8_t)n;
                        if (blk[0] != 0 || n) nz = 1;
                        left = n;
                        top_c[mbx * 9 + x + j] = n;
                    }
                    left_c[y + j] = left;
                }
            }
            non_zero[i] = (uint8_t)nz;
        }
    }

    delete[] top_bpred;
    delete[] top_c;
    // Partition 0 carries the mode/segment/skip data; if it overran, the
    // modes above were parsed from zero padding — report instead of
    // returning garbage (the coefficient partitions check via read_coeffs).
    if (b.is_eof()) error = 1;
    if (error) return -8;

    write_header_out(H, header_out, seg_out);
    return 0;
}

// Levels-mode entropy decode: the batch/device fast path.
//
// Differences from vp8_entropy_decode:
//   - levels[nmb*25*16] int16 holds RAW quantizer levels (no dequantization;
//     block 24 is the un-transformed Y2 block). The device dequantizes,
//     applies the inverse WHT to Y2 and folds its output into the 16 luma
//     DCs, and derives has_ac / non_zero / do_sub itself — so the host
//     writes only the (sparse) nonzero levels.
//   - mode outputs are uint8 (luma_mode, chroma_mode, segment_ids,
//     bpred[nmb*16], skipped).
//   - all output buffers MUST be zero-initialized by the caller (numpy
//     np.zeros batch slices); only nonzero values are written.
// Returns 0 on success, negative error code otherwise.
int vp8_entropy_decode16(const uint8_t* data, int len, const uint8_t* default_probs,
                         const uint8_t* update_probs, const uint8_t* bpred_probs,
                         const int16_t* dc_qtable, const int16_t* ac_qtable,
                         int32_t* header_out, int32_t* seg_out, uint8_t* luma_mode,
                         uint8_t* chroma_mode, uint8_t* segment_ids, uint8_t* bpred,
                         uint8_t* skipped, uint8_t* non_zero, int16_t* levels) {
    FrameHeader H;
    int rc = parse_frame_header(data, len, default_probs, update_probs,
                                dc_qtable, ac_qtable, H);
    if (rc) return rc;
    int mbw = H.mbw, mbh = H.mbh;
    BoolDec& b = H.b;
    int error = 0;

    std::vector<uint8_t> top_bpred(mbw * 4, 0);
    std::vector<uint8_t> top_c(mbw * 9, 0);

    for (int mby = 0; mby < mbh && !error; mby++) {
        BoolDec& part = H.parts[mby % H.num_partitions];
        uint8_t left_bpred[4] = {0, 0, 0, 0};
        uint8_t left_c[9] = {0};
        for (int mbx = 0; mbx < mbw && !error; mbx++) {
            int i = mby * mbw + mbx;
            int seg_id = 0;
            if (H.segments_enabled && H.segments_update_map)
                seg_id = b.read_tree(SEGMENT_TREE, H.seg_tree_probs);
            if (seg_id) segment_ids[i] = (uint8_t)seg_id;
            int skip = 0;
            if (H.prob_skip_false >= 0) skip = b.get_bit(H.prob_skip_false);
            if (skip) skipped[i] = 1;

            int luma = b.read_tree(YMODE_TREE, YMODE_PROBS);
            if (luma) luma_mode[i] = (uint8_t)luma;
            if (luma == 4) {
                for (int sy = 0; sy < 4; sy++) {
                    for (int sx = 0; sx < 4; sx++) {
                        int above = top_bpred[mbx * 4 + sx];
                        int left = left_bpred[sy];
                        int m = b.read_tree(BPRED_TREE,
                                            bpred_probs + (above * 10 + left) * 9);
                        if (m) bpred[i * 16 + sy * 4 + sx] = (uint8_t)m;
                        top_bpred[mbx * 4 + sx] = (uint8_t)m;
                        left_bpred[sy] = (uint8_t)m;
                    }
                }
            } else {
                static const int LUMA_TO_B[4] = {0, 2, 3, 1};  // DC,VE,HE,TM
                uint8_t bm = (uint8_t)LUMA_TO_B[luma];
                if (bm)
                    for (int k = 12; k < 16; k++) bpred[i * 16 + k] = bm;
                for (int sy = 0; sy < 4; sy++) left_bpred[sy] = bm;
                for (int sx = 0; sx < 4; sx++) top_bpred[mbx * 4 + sx] = bm;
            }
            int uv = b.read_tree(UV_TREE, UV_PROBS);
            if (uv) chroma_mode[i] = (uint8_t)uv;

            if (skip) {
                if (luma != 4) {
                    left_c[0] = 0;
                    top_c[mbx * 9] = 0;
                }
                for (int k = 1; k < 9; k++) {
                    left_c[k] = 0;
                    top_c[mbx * 9 + k] = 0;
                }
                continue;
            }

            int16_t* mb_levels = levels + (size_t)i * 25 * 16;
            int plane, first;
            int nz = 0;
            if (luma != 4) {
                int ctx = top_c[mbx * 9] + left_c[0];
                int n = read_coeffs(part, H.probs + 1 * 8 * 3 * 11, ctx, 1, 1, 0,
                                    mb_levels + 24 * 16, &error);
                left_c[0] = top_c[mbx * 9] = (uint8_t)n;
                // Legacy non_zero counts the Y2-folded luma DCs: the inverse
                // WHT is invertible, so "any folded DC nonzero" == "any Y2
                // level nonzero" (zero-valued coded tokens don't count).
                for (int k = 0; k < 16; k++)
                    if (mb_levels[24 * 16 + k]) { nz = 1; break; }
                plane = 0;
                first = 1;
            } else {
                plane = 3;
                first = 0;
            }

            for (int y = 0; y < 4; y++) {
                int left = left_c[y + 1];
                for (int x = 0; x < 4; x++) {
                    int bi = y * 4 + x;
                    int ctx = top_c[mbx * 9 + x + 1] + left;
                    int n = read_coeffs(part, H.probs + plane * 8 * 3 * 11, ctx, 1, 1,
                                        first, mb_levels + bi * 16, &error);
                    if (n || mb_levels[bi * 16]) nz = 1;
                    left = n;
                    top_c[mbx * 9 + x + 1] = (uint8_t)n;
                }
                left_c[y + 1] = (uint8_t)left;
            }
            for (int half = 0; half < 2; half++) {
                int j = half == 0 ? 5 : 7;
                int base = half == 0 ? 16 : 20;
                for (int y = 0; y < 2; y++) {
                    int left = left_c[y + j];
                    for (int x = 0; x < 2; x++) {
                        int bi = base + y * 2 + x;
                        int ctx = top_c[mbx * 9 + x + j] + left;
                        int n = read_coeffs(part, H.probs + 2 * 8 * 3 * 11, ctx, 1, 1,
                                            0, mb_levels + bi * 16, &error);
                        if (n || mb_levels[bi * 16]) nz = 1;
                        left = n;
                        top_c[mbx * 9 + x + j] = (uint8_t)n;
                    }
                    left_c[y + j] = (uint8_t)left;
                }
            }
            if (nz) non_zero[i] = 1;
        }
    }

    if (b.is_eof()) error = 1;
    if (error) return -8;

    write_header_out(H, header_out, seg_out);
    return 0;
}

// ---------------------------------------------------------------- encoder

struct BoolEnc {
    uint8_t* out;
    int cap;
    int len;
    uint32_t bottom;
    uint32_t range;
    int bit_num;
    int overflow;

    void init(uint8_t* buf, int capacity) {
        out = buf;
        cap = capacity;
        len = 0;
        bottom = 0;
        range = 255;
        bit_num = 24;
        overflow = 0;
    }
    void carry() {
        int i = len - 1;
        while (i >= 0) {
            if (out[i] < 255) {
                out[i]++;
                return;
            }
            out[i] = 0;
            i--;
        }
        // prepend 0x01
        if (len + 1 > cap) {
            overflow = 1;
            return;
        }
        memmove(out + 1, out, len);
        out[0] = 1;
        len++;
    }
    void push(uint8_t byte) {
        if (len >= cap) {
            overflow = 1;
            return;
        }
        out[len++] = byte;
    }
    void write_bool(int bit, int prob) {
        uint32_t split = 1 + (((range - 1) * (uint32_t)prob) >> 8);
        if (bit) {
            bottom += split;
            range -= split;
        } else {
            range = split;
        }
        while (range < 128) {
            range <<= 1;
            if (bottom & (1u << 31)) carry();
            bottom <<= 1;
            if (--bit_num == 0) {
                push((uint8_t)(bottom >> 24));
                bottom &= (1u << 24) - 1;
                bit_num = 8;
            }
        }
    }
    void flush() {
        int c = bit_num;
        uint32_t v = bottom;
        if (v & (1u << (32 - c))) carry();
        v <<= (c & 7);
        c = (c >> 3) - 1;
        while (c >= 0) {
            v <<= 8;
            c--;
        }
        for (int i = 0; i < 4; i++) {
            push((uint8_t)(v >> 24));
            v <<= 8;
        }
    }
};

// DCT token tree (leaf -token): token ids 0=EOB, 1="0", 2.."4"+, 6..11 cats.
const int8_t TOKEN_TREE[22] = {0,  2,  -1, 4,  -2, 6,  8,  12, -3, 10, -4,
                               -5, 14, 16, -6, -7, 18, 20, -8, -9, -10, -11};
const uint8_t DCT_CAT_BASE[6] = {5, 7, 11, 19, 35, 67};

// Precomputed token paths: [start 0|2][token][k] -> (bit<<4)|node, 0xFF end.
struct TokenPaths {
    uint8_t path[2][12][12];
    TokenPaths() {
        memset(path, 0xFF, sizeof(path));
        for (int s = 0; s < 2; s++) {
            int start = s * 2;
            build(start, start, 0, nullptr, s);
        }
    }
    void build(int start, int idx, int depth, uint8_t* prefix, int s) {
        static uint8_t buf[12];
        if (prefix == nullptr) prefix = buf;
        for (int bit = 0; bit < 2; bit++) {
            prefix[depth] = (uint8_t)((bit << 4) | (idx >> 1));
            int t = TOKEN_TREE[idx + bit];
            if (t <= 0) {
                int token = -t;
                for (int k = 0; k <= depth; k++) path[s][token][k] = prefix[k];
                if (depth + 1 < 12) path[s][token][depth + 1] = 0xFF;
            } else {
                build(start, t, depth + 1, prefix, s);
            }
        }
    }
};
const TokenPaths TOKEN_PATHS;

static inline void write_token(BoolEnc& e, const uint8_t* probs11, int token, int start) {
    const uint8_t* p = TOKEN_PATHS.path[start >> 1][token];
    for (int k = 0; k < 12 && p[k] != 0xFF; k++)
        e.write_bool(p[k] >> 4, probs11[p[k] & 0xF]);
}

}  // namespace

extern "C" {

// Encode quantized level blocks into a boolean-coded partition.
//
// levels: [n_blocks][16] zigzag-order levels.
// meta:   [n_blocks][4]: plane (0..3), first (0/1), ctx (0..2), unused.
// probs:  [4][8][3][11] token probabilities.
// out:    caller-allocated buffer; returns written length or negative error.
int vp8_token_encode(const int32_t* levels, const int32_t* meta, int n_blocks,
                     const uint8_t* probs, uint8_t* out, int out_cap) {
    BoolEnc e;
    e.init(out, out_cap);
    for (int bi = 0; bi < n_blocks; bi++) {
        const int32_t* blk = levels + bi * 16;
        int plane = meta[bi * 4 + 0];
        int first = meta[bi * 4 + 1];
        int ctx = meta[bi * 4 + 2];
        const uint8_t* plane_probs = probs + plane * 8 * 3 * 11;

        int end = 0;
        for (int k = 15; k >= 0; k--)
            if (blk[k] != 0) {
                end = k + 1;
                break;
            }
        int skip_eob = 0;
        int complexity = ctx;
        for (int i = first; i < end; i++) {
            int coeff = blk[i];
            int v = coeff < 0 ? -coeff : coeff;
            const uint8_t* p = plane_probs + (COEFF_BANDS[i] * 3 + complexity) * 11;
            int start = skip_eob ? 2 : 0;
            int token;
            if (v <= 4)
                token = 1 + v;
            else if (v <= 6)
                token = 6;
            else if (v <= 10)
                token = 7;
            else if (v <= 18)
                token = 8;
            else if (v <= 34)
                token = 9;
            else if (v <= 66)
                token = 10;
            else
                token = 11;
            write_token(e, p, token, start);
            if (token == 1) {  // zero
                skip_eob = 1;
                complexity = 0;
                continue;
            }
            skip_eob = 0;
            if (token >= 6) {
                int cat = token - 6;
                int extra = v - DCT_CAT_BASE[cat];
                int nbits = CAT_BITS[cat];
                for (int b2 = nbits - 1; b2 >= 0; b2--)
                    e.write_bool((extra >> b2) & 1, CAT_PROBS[cat][nbits - 1 - b2]);
            }
            e.write_bool(coeff < 0 ? 1 : 0, 128);
            complexity = v == 1 ? 1 : 2;
        }
        if (end < 16) {
            int band_idx = first > end ? first : end;
            const uint8_t* p = plane_probs + (COEFF_BANDS[band_idx] * 3 + complexity) * 11;
            write_token(e, p, 0, 0);  // EOB
        }
    }
    e.flush();
    if (e.overflow) return -1;
    return e.len;
}

}  // extern "C"

// ---------------------------------------------------------------- MB headers

namespace {

// Generic tree path tables (bit<<4 | node), 0xFF terminated.
struct TreePaths {
    uint8_t path[16][12];
    void build(const int8_t* tree, int len) {
        memset(path, 0xFF, sizeof(path));
        uint8_t prefix[12];
        walk(tree, 0, 0, prefix);
        (void)len;
    }
    void walk(const int8_t* tree, int idx, int depth, uint8_t* prefix) {
        for (int bit = 0; bit < 2; bit++) {
            prefix[depth] = (uint8_t)((bit << 4) | (idx >> 1));
            int t = tree[idx + bit];
            if (t <= 0) {
                int v = -t;
                for (int k = 0; k <= depth; k++) path[v][k] = prefix[k];
                if (depth + 1 < 12) path[v][depth + 1] = 0xFF;
            } else {
                walk(tree, t, depth + 1, prefix);
            }
        }
    }
};

struct MbHeaderTables {
    TreePaths ymode, uv, bpred, seg;
    MbHeaderTables() {
        ymode.build(YMODE_TREE, 8);
        uv.build(UV_TREE, 6);
        bpred.build(BPRED_TREE, 18);
        seg.build(SEGMENT_TREE, 6);
    }
};
const MbHeaderTables MB_TABLES;

static inline void write_path(BoolEnc& e, const TreePaths& tp, int value, const uint8_t* probs) {
    const uint8_t* p = tp.path[value];
    for (int k = 0; k < 12 && p[k] != 0xFF; k++) e.write_bool(p[k] >> 4, probs[p[k] & 0xF]);
}

}  // namespace

extern "C" {

// Continue an in-progress boolean encoder with all MB headers, then flush.
// state_in: partial output bytes (header fields already written).
// Returns total length written to out (state_in copied to its head), or <0.
int vp8_mbheader_encode(const uint8_t* state_bytes, int state_len, uint32_t bottom,
                        uint32_t range_, int bit_num, const int32_t* luma_mode,
                        const int32_t* bpred, const int32_t* chroma_mode,
                        const int32_t* segment_ids, const uint8_t* skipped, int nmb,
                        int mbw, int skip_prob, int write_segments,
                        const uint8_t* seg_tree_probs, const uint8_t* bpred_probs,
                        uint8_t* out, int out_cap) {
    if (state_len > out_cap) return -1;
    memcpy(out, state_bytes, state_len);
    BoolEnc e;
    e.init(out, out_cap);
    e.len = state_len;
    e.bottom = bottom;
    e.range = range_;
    e.bit_num = bit_num;

    static const int LUMA_TO_B[4] = {0, 2, 3, 1};
    std::vector<int32_t> top_bpred((size_t)mbw * 4, 0);
    int mbh = nmb / mbw;
    for (int mby = 0; mby < mbh; mby++) {
        int32_t left_bpred[4] = {0, 0, 0, 0};
        for (int mbx = 0; mbx < mbw; mbx++) {
            int i = mby * mbw + mbx;
            if (write_segments)
                write_path(e, MB_TABLES.seg, segment_ids[i], seg_tree_probs);
            e.write_bool(skipped[i] ? 1 : 0, skip_prob);
            int lm = luma_mode[i];
            write_path(e, MB_TABLES.ymode, lm, YMODE_PROBS);
            if (lm == 4) {
                for (int sy = 0; sy < 4; sy++) {
                    for (int sx = 0; sx < 4; sx++) {
                        int m = bpred[(size_t)i * 16 + sy * 4 + sx];
                        const uint8_t* probs =
                            bpred_probs + (top_bpred[mbx * 4 + sx] * 10 + left_bpred[sy]) * 9;
                        write_path(e, MB_TABLES.bpred, m, probs);
                        top_bpred[mbx * 4 + sx] = m;
                        left_bpred[sy] = m;
                    }
                }
            } else {
                int bm = LUMA_TO_B[lm];
                for (int k = 0; k < 4; k++) {
                    top_bpred[mbx * 4 + k] = bm;
                    left_bpred[k] = bm;
                }
            }
            write_path(e, MB_TABLES.uv, chroma_mode[i], UV_PROBS);
        }
    }
    e.flush();
    if (e.overflow) return -2;
    return e.len;
}

}  // extern "C"

extern "C" {

// Token statistics for probability adaptation: counts (total, ones) per
// [plane][band][ctx][node] over level blocks, mirroring the encoder's
// skip-eob walk (webp_tpu/encode/costs.py record_blocks).
int vp8_token_stats(const int32_t* levels, const int32_t* meta, int n_blocks,
                    int64_t* totals, int64_t* ones) {
    auto rec = [&](int t, int band, int ctx, int node, int bit) {
        size_t idx = (((size_t)t * 8 + band) * 3 + ctx) * 11 + node;
        totals[idx]++;
        ones[idx] += bit;
    };
    for (int bi = 0; bi < n_blocks; bi++) {
        const int32_t* blk = levels + (size_t)bi * 16;
        int t = meta[bi * 4 + 0];
        int first = meta[bi * 4 + 1];
        int ctx = meta[bi * 4 + 2];
        int end = 0;
        for (int k = 15; k >= first; k--)
            if (blk[k] != 0) {
                end = k + 1;
                break;
            }
        if (end <= first) {
            rec(t, COEFF_BANDS[first], ctx, 0, 0);
            continue;
        }
        int skip_eob = 0;
        int n = first;
        while (n < end) {
            int band = COEFF_BANDS[n];
            int v = blk[n] < 0 ? -blk[n] : blk[n];
            n++;
            if (!skip_eob) rec(t, band, ctx, 0, 1);
            if (v == 0) {
                rec(t, band, ctx, 1, 0);
                skip_eob = 1;
                ctx = 0;
                continue;
            }
            rec(t, band, ctx, 1, 1);
            skip_eob = 0;
            if (v == 1) {
                rec(t, band, ctx, 2, 0);
                ctx = 1;
            } else {
                rec(t, band, ctx, 2, 1);
                int vc = v < 67 ? v : 67;
                if (vc <= 4) {
                    rec(t, band, ctx, 3, 0);
                    if (vc == 2) {
                        rec(t, band, ctx, 4, 0);
                    } else {
                        rec(t, band, ctx, 4, 1);
                        rec(t, band, ctx, 5, vc == 4);
                    }
                } else if (vc <= 10) {
                    rec(t, band, ctx, 3, 1);
                    rec(t, band, ctx, 6, 0);
                    rec(t, band, ctx, 7, vc > 6);
                } else {
                    rec(t, band, ctx, 3, 1);
                    rec(t, band, ctx, 6, 1);
                    if (vc < 3 + (8 << 2)) {
                        rec(t, band, ctx, 8, 0);
                        rec(t, band, ctx, 9, vc >= 3 + (8 << 1));
                    } else {
                        rec(t, band, ctx, 8, 1);
                        rec(t, band, ctx, 10, vc >= 3 + (8 << 3));
                    }
                }
                ctx = 2;
            }
        }
        if (n < 16) rec(t, COEFF_BANDS[n], ctx, 0, 0);
    }
    return 0;
}

}  // extern "C"

extern "C" {

// BT.601 fixed-point RGB->YUV420 with 2x2 chroma averaging and
// edge-replicated padding to whole macroblocks.  Bit-exact twin of
// webp_tpu/ops/yuv.py:rgb_to_yuv420 (parity target: the reference's
// convert_image_yuv, /root/reference/src/decoder/yuv.rs:656-898).
// rgb: [h, w, channels] uint8 (channels 3 or 4); y out [mbh*16, mbw*16];
// u/v out [mbh*8, mbw*8].
int rgb_to_yuv420(const uint8_t* rgb, int h, int w, int channels,
                  uint8_t* y, uint8_t* u, uint8_t* v) {
    if (h <= 0 || w <= 0 || (channels != 3 && channels != 4)) return -1;
    const int YUV_FIX = 16;
    const int64_t YUV_HALF = 1 << (YUV_FIX - 1);
    const int mbw = (w + 15) / 16, mbh = (h + 15) / 16;
    const int yw = mbw * 16, yh = mbh * 16;
    const int cw2 = mbw * 8, ch2 = mbh * 8;
    // Luma: padded rows/cols replicate the last image row/col (clamped src).
    for (int py = 0; py < yh; py++) {
        const int sy = py < h ? py : h - 1;
        const uint8_t* row = rgb + (size_t)sy * w * channels;
        uint8_t* orow = y + (size_t)py * yw;
        for (int px = 0; px < yw; px++) {
            const int sx = px < w ? px : w - 1;
            const uint8_t* p = row + (size_t)sx * channels;
            int64_t r = p[0], g = p[1], b = p[2];
            orow[px] = (uint8_t)((16839 * r + 33059 * g + 6420 * b + YUV_HALF +
                                  ((int64_t)16 << YUV_FIX)) >> YUV_FIX);
        }
    }
    // Chroma: 2x2 average of the raw (un-rounded) U/V values with edge
    // replication for odd dimensions, then padded by clamping.
    const int ch = (h + 1) / 2, cwid = (w + 1) / 2;
    for (int cy = 0; cy < ch2; cy++) {
        const int scy = cy < ch ? cy : ch - 1;
        uint8_t* ur = u + (size_t)cy * cw2;
        uint8_t* vr = v + (size_t)cy * cw2;
        for (int cx = 0; cx < cw2; cx++) {
            const int scx = cx < cwid ? cx : cwid - 1;
            int64_t us = 0, vs = 0;
            for (int dy = 0; dy < 2; dy++) {
                int syy = 2 * scy + dy; if (syy >= h) syy = h - 1;
                for (int dx = 0; dx < 2; dx++) {
                    int sxx = 2 * scx + dx; if (sxx >= w) sxx = w - 1;
                    const uint8_t* p = rgb + ((size_t)syy * w + sxx) * channels;
                    int64_t r = p[0], g = p[1], b = p[2];
                    us += -9719 * r - 19081 * g + 28800 * b + ((int64_t)128 << YUV_FIX);
                    vs += 28800 * r - 24116 * g - 4684 * b + ((int64_t)128 << YUV_FIX);
                }
            }
            ur[cx] = (uint8_t)((us + (YUV_HALF << 2)) >> (YUV_FIX + 2));
            vr[cx] = (uint8_t)((vs + (YUV_HALF << 2)) >> (YUV_FIX + 2));
        }
    }
    return 0;
}

}  // extern "C"

extern "C" {

// Fancy (9:3:3:1 bilinear) YUV420 -> RGB, libwebp fixed-point math.
// Bit-exact twin of webp_tpu/ops/yuv.py:fancy_yuv420_to_rgb (reference:
// /root/reference/src/decoder/yuv.rs:36-158,385-391).
// y: padded [.., ystride]; u/v: padded [.., cstride]; rgb out [h, w, 3].
int yuv420_to_rgb_fancy(const uint8_t* y, int ystride,
                        const uint8_t* u, const uint8_t* v, int cstride,
                        int width, int height, uint8_t* rgb) {
    if (width <= 0 || height <= 0) return -1;
    const int ch = (height + 1) / 2, cw = (width + 1) / 2;
    for (int r = 0; r < height; r++) {
        const int mr = r >> 1;
        int fr = (r & 1) ? mr + 1 : mr - 1;
        if (fr < 0) fr = 0;
        if (fr >= ch) fr = ch - 1;
        const uint8_t* um = u + (size_t)mr * cstride;
        const uint8_t* uf = u + (size_t)fr * cstride;
        const uint8_t* vm = v + (size_t)mr * cstride;
        const uint8_t* vf = v + (size_t)fr * cstride;
        const uint8_t* yr = y + (size_t)r * ystride;
        uint8_t* out = rgb + (size_t)r * width * 3;
        for (int x = 0; x < width; x++) {
            const int mc = x >> 1;
            int fc = (x & 1) ? mc + 1 : mc - 1;
            if (fc < 0) fc = 0;
            if (fc >= cw) fc = cw - 1;
            const int uu = (9 * um[mc] + 3 * um[fc] + 3 * uf[mc] + uf[fc] + 8) >> 4;
            const int vv = (9 * vm[mc] + 3 * vm[fc] + 3 * vf[mc] + vf[fc] + 8) >> 4;
            const int yv = ((int)yr[x] * 19077) >> 8;
            int rr = (yv + ((vv * 26149) >> 8) - 14234) >> 6;
            int gg = (yv - ((uu * 6419) >> 8) - ((vv * 13320) >> 8) + 8708) >> 6;
            int bb = (yv + ((uu * 33050) >> 8) - 17685) >> 6;
            out[3 * x + 0] = (uint8_t)(rr < 0 ? 0 : (rr > 255 ? 255 : rr));
            out[3 * x + 1] = (uint8_t)(gg < 0 ? 0 : (gg > 255 ? 255 : gg));
            out[3 * x + 2] = (uint8_t)(bb < 0 ? 0 : (bb > 255 ? 255 : bb));
        }
    }
    return 0;
}

}  // extern "C"

extern "C" {

// Expand the encoder's coalesced per-MB sparse wire into dense int16
// levels [nmb, 400].  bitmap bits are np.packbits order (MSB first); MB
// m's nonzeros occupy rank order k = 0..count-1 as int4 nibbles of
// vals4[m] (lo nibble first), with |v|>7 ranks overridden by the med list
// (rank index u8, int8 value; padding entries carry val 0).  Image-level
// |v|>127 escapes are applied by the python caller afterwards.
int wire_expand_levels(const uint8_t* bitmap, const uint8_t* vals4,
                       const uint8_t* med_idx, const int8_t* med_val,
                       int nmb, int cap_mb, int med_cap, int16_t* out) {
    for (int m = 0; m < nmb; m++) {
        const uint8_t* bm = bitmap + (size_t)m * 50;  // 400 bits
        const uint8_t* v4 = vals4 + (size_t)m * (cap_mb / 2);
        int16_t* dst = out + (size_t)m * 400;
        // Decode this MB's nonzero values (nibbles + med overrides).
        int16_t vals[512];
        int cnt_hint = 0;
        for (int b = 0; b < 50; b++) cnt_hint += __builtin_popcount(bm[b]);
        if (cnt_hint > cap_mb) return -1;  // sp_over image: dense path
        for (int k = 0; k < cnt_hint; k++) {
            int nib = (k & 1) ? (v4[k >> 1] >> 4) : (v4[k >> 1] & 0xF);
            vals[k] = (int16_t)(nib >= 8 ? nib - 16 : nib);
        }
        const uint8_t* mi = med_idx + (size_t)m * med_cap;
        const int8_t* mv = med_val + (size_t)m * med_cap;
        for (int e = 0; e < med_cap && mv[e] != 0; e++) {
            if (mi[e] >= cnt_hint) return -3;
            vals[mi[e]] = mv[e];
        }
        int k = 0;
        for (int b = 0; b < 50; b++) {
            uint8_t bits = bm[b];
            while (bits) {
                int lead = __builtin_clz((unsigned)bits) - 24;  // MSB first
                dst[b * 8 + lead] = vals[k++];
                bits &= ~(0x80u >> lead);
            }
        }
    }
    return 0;
}

}  // extern "C"
