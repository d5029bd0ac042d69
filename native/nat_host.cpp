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
