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

#include <cstdint>
#include <cstdio>
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
