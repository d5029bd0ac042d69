// nat-tpu native host runtime: the host-side hot paths of the tokenizer
// pipeline, in C++ (loaded via ctypes; every entry point has a pure-Python
// fallback in nat_tpu).
//
// 1. NDJSON serialization — at >100x real-time a chip emits >4300
//    frames/sec of `{"event":"frame",...}` lines; building Python dicts and
//    json.dumps'ing them dominates host CPU. serialize_dense_frames and
//    serialize_rle_stream write the byte stream directly.
// 2. PCM decode — interleaved 16/24-bit PCM to float32 mono mixdown.
//
// The wire format matches nat_tpu/stream/ndjson.py exactly (compact
// separators, 3-decimal rounding of ts/dur, layer order S then A).

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

namespace {

// Append an integer without printf overhead.
inline void append_int(std::string &out, long long v) {
    char buf[24];
    int n = snprintf(buf, sizeof buf, "%lld", v);
    out.append(buf, n);
}

// Round to 3 decimals and append with minimal digits (json.dumps style:
// trailing zeros trimmed, integral values keep ".0").
inline void append_ms(std::string &out, double v) {
    double r = std::round(v * 1000.0) / 1000.0;
    char buf[40];
    int n = snprintf(buf, sizeof buf, "%.3f", r);
    // trim trailing zeros but keep at least one decimal digit
    while (n > 0 && buf[n - 1] == '0') n--;
    if (n > 0 && buf[n - 1] == '.') n++;  // keep "x.0"
    out.append(buf, n);
}

}  // namespace

extern "C" {

// Serialize dense frame events for frames [0, num_frames).
//   sem: int32 [num_sem_layers, num_frames] row-major
//   acc: int32 [num_acc_layers, num_frames]
//   frame_dur_ms: per-frame duration (ts = fi * frame_dur_ms)
// Returns a malloc'd NUL-terminated buffer (caller frees via nat_free);
// length written to *out_len.
char *serialize_dense_frames(const int32_t *sem, int num_sem_layers,
                             const int32_t *acc, int num_acc_layers,
                             int num_frames, double frame_dur_ms,
                             int64_t fi_base, size_t *out_len) {
    std::string out;
    out.reserve((size_t)num_frames * (64 + 8 * (num_sem_layers + num_acc_layers)));
    for (int i = 0; i < num_frames; ++i) {
        const int64_t fi = fi_base + i;
        out += "{\"event\":\"frame\",\"fi\":";
        append_int(out, fi);
        out += ",\"ts\":";
        append_ms(out, fi * frame_dur_ms);
        out += ",\"dur\":";
        append_ms(out, frame_dur_ms);
        out += ",\"S\":[";
        for (int l = 0; l < num_sem_layers; ++l) {
            if (l) out += ',';
            append_int(out, sem[(size_t)l * num_frames + i]);
        }
        out += "],\"A\":[";
        for (int l = 0; l < num_acc_layers; ++l) {
            if (l) out += ',';
            append_int(out, acc[(size_t)l * num_frames + i]);
        }
        out += "]}\n";
    }
    *out_len = out.size();
    char *buf = (char *)malloc(out.size() + 1);
    memcpy(buf, out.data(), out.size());
    buf[out.size()] = '\0';
    return buf;
}

void nat_free(char *ptr) { free(ptr); }

// Interleaved little-endian int16 PCM -> mono float32 (mean over channels).
// Returns number of output samples.
int64_t pcm16_to_float_mono(const uint8_t *data, int64_t num_bytes,
                            int channels, float *out) {
    const int16_t *pcm = (const int16_t *)data;
    int64_t total = num_bytes / 2;
    int64_t frames = total / channels;
    const float scale = 1.0f / 32768.0f;
    if (channels == 1) {
        for (int64_t i = 0; i < frames; ++i) out[i] = pcm[i] * scale;
    } else {
        const float inv_ch = 1.0f / channels;
        for (int64_t i = 0; i < frames; ++i) {
            float acc = 0.0f;
            for (int c = 0; c < channels; ++c) acc += pcm[i * channels + c];
            out[i] = acc * scale * inv_ch;
        }
    }
    return frames;
}

// Interleaved little-endian 24-bit PCM -> mono float32.
int64_t pcm24_to_float_mono(const uint8_t *data, int64_t num_bytes,
                            int channels, float *out) {
    int64_t total = num_bytes / 3;
    int64_t frames = total / channels;
    const float scale = 1.0f / 8388608.0f;
    const float inv_ch = 1.0f / channels;
    for (int64_t i = 0; i < frames; ++i) {
        float acc = 0.0f;
        for (int c = 0; c < channels; ++c) {
            const uint8_t *p = data + (i * channels + c) * 3;
            int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
            if (v & 0x800000) v -= (1 << 24);
            acc += (float)v;
        }
        out[i] = acc * scale * inv_ch;
    }
    return frames;
}

// ---------------------------------------------------------------------------
// RLE stream serialization (nat_tpu/stream/protocol.py feed_frames /
// create_ndjson_stream RLE branches, byte-identical).  At realistic token
// change rates most frames emit a line, so the per-frame Python dict build +
// json.dumps dominates host time on --rle streams the same way it did on
// dense ones.
// ---------------------------------------------------------------------------

namespace {

// CPython float repr: shortest decimal string that round-trips, fixed-point
// form when the decimal exponent is in [-4, 16).  Needed for "dur" values,
// which accumulate (dur += elapsed * frame_dur) into full-precision doubles.
// std::to_chars scientific mode (Ryu) yields the shortest mantissa directly
// (a %.*g precision-search loop measured ~16 snprintf+strtod per value —
// it dominated the whole serializer); reformat it CPython-style.
inline void append_repr(std::string &out, double v) {
    char buf[48];
    auto res = std::to_chars(buf, buf + sizeof buf, v,
                             std::chars_format::scientific);
    int n = (int)(res.ptr - buf);
    char *e = (char *)memchr(buf, 'e', n);
    // digits of the mantissa, sign, decimal exponent
    char digits[24];
    int nd = 0;
    bool neg = false;
    for (char *p = buf; p < e; ++p) {
        if (*p == '-') neg = true;
        else if (*p >= '0' && *p <= '9') digits[nd++] = *p;
    }
    int exp = atoi(e + 1);
    if (neg) out += '-';
    if (exp >= 16 || exp < -4) {
        // CPython exponent form: d[.ddd]e±NN (≥2 exponent digits).
        out += digits[0];
        if (nd > 1) {
            out += '.';
            out.append(digits + 1, nd - 1);
        }
        char tail[8];
        out.append(tail, snprintf(tail, sizeof tail, "e%+03d", exp));
        return;
    }
    if (exp >= 0) {
        if (nd <= exp + 1) {
            out.append(digits, nd);
            out.append((size_t)(exp + 1 - nd), '0');
            out += ".0";
        } else {
            out.append(digits, exp + 1);
            out += '.';
            out.append(digits + exp + 1, nd - exp - 1);
        }
    } else {
        out += "0.";
        out.append((size_t)(-exp - 1), '0');
        out.append(digits, nd);
    }
}

// repr(round(v, 3)): glibc %.3f correctly rounds the exact binary value
// (ties-to-even), exactly like Python round(v, 3); the shortest repr of the
// resulting ≤3-decimal value is the zero-trimmed string.
inline void append_round3(std::string &out, double v) {
    char buf[344];
    int n = snprintf(buf, sizeof buf, "%.3f", v);
    while (n > 0 && buf[n - 1] == '0') n--;
    if (n > 0 && buf[n - 1] == '.') n++;  // keep "x.0"
    out.append(buf, n);
}

inline uint32_t mask_all(int n) {
    return n >= 32 ? 0xFFFFFFFFu : ((1u << n) - 1u);
}

}  // namespace

// Numeric-only carry of the streamer's cross-chunk RLE state: the buffered
// "tokens" event (ndjson.py buffered_event) plus change/keyframe context.
// Layout mirrored by nat_tpu/io/native.py RleCarry — keep in sync.
typedef struct {
    int32_t has_buffered;
    int32_t pad0;
    int64_t fi;               // buffered event's frame index
    double dur;               // accumulating duration (ms)
    uint32_t sem_mask;        // changed RLE-encoded layers at that frame
    uint32_t acc_mask;
    int64_t last_fi;          // streamer.last_frame_index
    double last_keyframe_ms;  // interval rule state (feed_frames path)
    int32_t has_prev;
    int32_t pad1;
    int32_t sem_vals[32];     // full token column at the buffered frame
    int32_t acc_vals[32];
    int32_t prev_sem[32];     // last column of the previous chunk
    int32_t prev_acc[32];
} NatRleCarry;

namespace {

// The buffered "tokens" event: change-keys only for RLE-encoded layers
// (S ascending then A ascending, matching changed_layers order), then the
// FULL dense-layer vectors.
inline void render_tokens_event(std::string &out, const NatRleCarry *c,
                                int Ls, int La, double frame_dur_ms,
                                uint32_t sem_rle, uint32_t acc_rle) {
    out += "{\"event\":\"tokens\",\"fi\":";
    append_int(out, c->fi);
    out += ",\"ts\":";
    append_round3(out, (double)c->fi * frame_dur_ms);
    out += ",\"dur\":";
    append_repr(out, c->dur);
    for (int l = 0; l < Ls; ++l)
        if (c->sem_mask & (1u << l)) {
            out += ",\"S";
            append_int(out, l);
            out += "\":";
            append_int(out, c->sem_vals[l]);
        }
    for (int l = 0; l < La; ++l)
        if (c->acc_mask & (1u << l)) {
            out += ",\"A";
            append_int(out, l);
            out += "\":";
            append_int(out, c->acc_vals[l]);
        }
    if (mask_all(Ls) & ~sem_rle) {
        out += ",\"S_dense\":[";
        bool first = true;
        for (int l = 0; l < Ls; ++l)
            if (!(sem_rle & (1u << l))) {
                if (!first) out += ',';
                first = false;
                append_int(out, c->sem_vals[l]);
            }
        out += ']';
    }
    if (mask_all(La) & ~acc_rle) {
        out += ",\"A_dense\":[";
        bool first = true;
        for (int l = 0; l < La; ++l)
            if (!(acc_rle & (1u << l))) {
                if (!first) out += ',';
                first = false;
                append_int(out, c->acc_vals[l]);
            }
        out += ']';
    }
    out += "}\n";
}

inline void render_keyframe_event(std::string &out, int64_t fi,
                                  const int32_t *sem, const int32_t *acc,
                                  int Ls, int La, int T, int i,
                                  double frame_dur_ms, double dur_rounded) {
    out += "{\"event\":\"frame\",\"fi\":";
    append_int(out, fi);
    out += ",\"ts\":";
    append_round3(out, (double)fi * frame_dur_ms);
    out += ",\"dur\":";
    append_repr(out, dur_rounded);
    out += ",\"S\":[";
    for (int l = 0; l < Ls; ++l) {
        if (l) out += ',';
        append_int(out, sem[(size_t)l * T + i]);
    }
    out += "],\"A\":[";
    for (int l = 0; l < La; ++l) {
        if (l) out += ',';
        append_int(out, acc[(size_t)l * T + i]);
    }
    out += "],\"is_keyframe\":true}\n";
}

}  // namespace

// Serialize one chunk's RLE lines; updates *carry in place so the next call
// (or the Python end-of-stream flush) continues exactly where this left off.
//   sem/acc: int32 [L, T] row-major; fi_base: absolute index of column 0.
//   dur_rounded: streamer._dur_rounded (round(frame_dur_ms, 3), computed by
//     Python so the buffered event's initial dur is bit-identical).
//   keyframe_mask: nullable uint8 [T] explicit schedule (batch path);
//     when null the interval rule runs on carry->last_keyframe_ms.
// Returns malloc'd newline-terminated lines ("" when nothing emitted).
char *serialize_rle_frames(const int32_t *sem, int Ls, const int32_t *acc,
                           int La, int T, double frame_dur_ms,
                           double dur_rounded, int64_t fi_base,
                           uint32_t sem_rle_mask, uint32_t acc_rle_mask,
                           double keyframe_interval_ms,
                           const uint8_t *keyframe_mask, NatRleCarry *carry,
                           size_t *out_len) {
    std::string out;
    out.reserve((size_t)T * 48 + 64);
    for (int i = 0; i < T; ++i) {
        const int64_t fi = fi_base + i;
        uint32_t ch_s = 0, ch_a = 0;
        if (i == 0 && !carry->has_prev) {
            ch_s = mask_all(Ls);
            ch_a = mask_all(La);
        } else {
            for (int l = 0; l < Ls; ++l) {
                const int32_t prev = i ? sem[(size_t)l * T + i - 1]
                                       : carry->prev_sem[l];
                if (sem[(size_t)l * T + i] != prev) ch_s |= 1u << l;
            }
            for (int l = 0; l < La; ++l) {
                const int32_t prev = i ? acc[(size_t)l * T + i - 1]
                                       : carry->prev_acc[l];
                if (acc[(size_t)l * T + i] != prev) ch_a |= 1u << l;
            }
        }
        const double time_ms = (double)fi * frame_dur_ms;
        const bool is_kf =
            keyframe_mask ? (keyframe_mask[i] != 0)
                          : (time_ms - carry->last_keyframe_ms >=
                             keyframe_interval_ms);
        if (!is_kf && !(ch_s | ch_a)) continue;
        if (is_kf) {
            if (!keyframe_mask) carry->last_keyframe_ms = time_ms;
            if (carry->has_buffered) {
                // Fold skipped unchanged frames into the buffered run first
                // (the reference walks every frame, so its buffer is already
                // extended to fi-1), then flush.
                const int64_t elapsed = (fi - 1) - carry->last_fi;
                if (elapsed > 0) {
                    carry->dur += (double)elapsed * frame_dur_ms;
                    carry->last_fi = fi - 1;
                }
                render_tokens_event(out, carry, Ls, La, frame_dur_ms,
                                    sem_rle_mask, acc_rle_mask);
                carry->has_buffered = 0;
            }
            render_keyframe_event(out, fi, sem, acc, Ls, La, T, i,
                                  frame_dur_ms, dur_rounded);
        } else {
            if (carry->has_buffered) {
                carry->dur += (double)(fi - carry->last_fi) * frame_dur_ms;
                render_tokens_event(out, carry, Ls, La, frame_dur_ms,
                                    sem_rle_mask, acc_rle_mask);
            }
            carry->has_buffered = 1;
            carry->fi = fi;
            carry->dur = dur_rounded;
            carry->sem_mask = ch_s & sem_rle_mask;
            carry->acc_mask = ch_a & acc_rle_mask;
            for (int l = 0; l < Ls; ++l)
                carry->sem_vals[l] = sem[(size_t)l * T + i];
            for (int l = 0; l < La; ++l)
                carry->acc_vals[l] = acc[(size_t)l * T + i];
            carry->last_fi = fi;
        }
    }
    if (T > 0) {
        for (int l = 0; l < Ls; ++l)
            carry->prev_sem[l] = sem[(size_t)l * T + T - 1];
        for (int l = 0; l < La; ++l)
            carry->prev_acc[l] = acc[(size_t)l * T + T - 1];
        carry->has_prev = 1;
    }
    *out_len = out.size();
    char *buf = (char *)malloc(out.size() + 1);
    memcpy(buf, out.data(), out.size());
    buf[out.size()] = '\0';
    return buf;
}

// Direct fuzz hook for append_repr (tests compare against Python repr).
int nat_format_repr(double v, char *buf, int buflen) {
    std::string s;
    append_repr(s, v);
    if ((int)s.size() + 1 > buflen) return -1;
    memcpy(buf, s.data(), s.size() + 1);
    return (int)s.size();
}

// Vectorized RLE scan: for each frame, bitmask of layers that changed vs the
// previous frame (bit l set = layer l changed; frame 0 = all changed).
// codes: int32 [num_layers, num_frames]; out_mask: uint32 [num_frames].
void change_mask(const int32_t *codes, int num_layers, int num_frames,
                 uint32_t *out_mask) {
    if (num_frames <= 0) return;
    out_mask[0] = (num_layers >= 32) ? 0xFFFFFFFFu
                                     : ((1u << num_layers) - 1u);
    for (int fi = 1; fi < num_frames; ++fi) out_mask[fi] = 0;
    for (int l = 0; l < num_layers; ++l) {
        const int32_t *row = codes + (size_t)l * num_frames;
        const uint32_t bit = 1u << l;
        for (int fi = 1; fi < num_frames; ++fi) {
            if (row[fi] != row[fi - 1]) out_mask[fi] |= bit;
        }
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// FLAC hot loops (bit-level residual decode, predictor restore, CRCs).
// Python (nat_tpu/io/flac.py) keeps the cheap per-frame header parsing and
// calls these for the per-sample work.
// ---------------------------------------------------------------------------

extern "C" {

namespace {

struct BitCursor {
    const uint8_t *data;
    int64_t nbytes;
    int64_t pos;  // bit position

    inline int read_bit() {
        int64_t byte = pos >> 3;
        if (byte >= nbytes) return -1;
        int bit = 7 - (pos & 7);
        pos++;
        return (data[byte] >> bit) & 1;
    }

    inline int64_t read_bits(int n) {  // n <= 57 safe
        int64_t value = 0;
        for (int i = 0; i < n; ++i) {
            int b = read_bit();
            if (b < 0) return -1;
            value = (value << 1) | b;
        }
        return value;
    }

    inline int64_t read_unary() {
        int64_t q = 0;
        for (;;) {
            int b = read_bit();
            if (b < 0) return -1;
            if (b) return q;
            q++;
        }
    }
};

}  // namespace

// Decode one residual section (method+partitions+rice) starting at *bitpos.
// Returns 0 on success, negative on error; updates *bitpos.
// Residuals are int64: 32-bit-per-sample streams (sample-size code 7) can
// carry residuals exceeding int32; the pure-Python fallback keeps
// arbitrary-precision ints, so the native path must not silently wrap.
int flac_decode_residual(const uint8_t *data, int64_t nbytes,
                         int64_t *bitpos, int block_size, int order,
                         int64_t *out /* block_size - order entries */) {
    BitCursor c{data, nbytes, *bitpos};
    int64_t method = c.read_bits(2);
    if (method < 0 || method > 1) return -1;
    int param_bits = method == 0 ? 4 : 5;
    int escape = method == 0 ? 0xF : 0x1F;
    int64_t partition_order = c.read_bits(4);
    if (partition_order < 0) return -2;
    int num_partitions = 1 << partition_order;
    if (block_size % num_partitions) return -3;
    int64_t idx = 0;
    for (int p = 0; p < num_partitions; ++p) {
        int count = block_size / num_partitions - (p == 0 ? order : 0);
        int64_t param = c.read_bits(param_bits);
        if (param < 0) return -4;
        if (param == escape) {
            int64_t raw_bits = c.read_bits(5);
            if (raw_bits < 0) return -5;
            for (int i = 0; i < count; ++i) {
                if (raw_bits == 0) { out[idx++] = 0; continue; }
                int64_t v = c.read_bits((int)raw_bits);
                if (v < 0) return -6;
                if (v >= (int64_t)1 << (raw_bits - 1)) v -= (int64_t)1 << raw_bits;
                out[idx++] = v;
            }
        } else {
            for (int i = 0; i < count; ++i) {
                int64_t q = c.read_unary();
                if (q < 0) return -7;
                int64_t low = param ? c.read_bits((int)param) : 0;
                if (low < 0) return -8;
                int64_t folded = (q << param) | low;
                out[idx++] = (folded >> 1) ^ -(folded & 1);
            }
        }
    }
    *bitpos = c.pos;
    return 0;
}

// Read `count` signed values of `bits` width starting at *bitpos.
int flac_read_signed_array(const uint8_t *data, int64_t nbytes,
                           int64_t *bitpos, int count, int bits,
                           int64_t *out) {
    BitCursor c{data, nbytes, *bitpos};
    for (int i = 0; i < count; ++i) {
        int64_t v = c.read_bits(bits);
        if (v < 0) return -1;
        if (bits > 0 && v >= (int64_t)1 << (bits - 1)) v -= (int64_t)1 << bits;
        out[i] = v;
    }
    *bitpos = c.pos;
    return 0;
}

// In-place predictor restore: samples[0:order] are warmup, residual has
// n entries; fills samples[order:order+n].
void flac_restore_lpc(int64_t *samples, const int64_t *residual, int n,
                      const int32_t *coeffs, int order, int shift) {
    for (int i = 0; i < n; ++i) {
        int64_t acc = 0;
        int64_t *base = samples + order + i;
        for (int k = 0; k < order; ++k) acc += (int64_t)coeffs[k] * base[-k - 1];
        base[0] = (acc >> shift) + residual[i];
    }
}

uint8_t flac_crc8(const uint8_t *data, int64_t n) {
    uint8_t crc = 0;
    for (int64_t i = 0; i < n; ++i) {
        crc ^= data[i];
        for (int b = 0; b < 8; ++b)
            crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
    }
    return crc;
}

uint16_t flac_crc16(const uint8_t *data, int64_t n) {
    uint16_t crc = 0;
    for (int64_t i = 0; i < n; ++i) {
        crc ^= (uint16_t)(data[i] << 8);
        for (int b = 0; b < 8; ++b)
            crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005)
                                 : (uint16_t)(crc << 1);
    }
    return crc;
}

}  // extern "C"
