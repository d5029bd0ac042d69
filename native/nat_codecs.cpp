// nat-tpu codec shim: compressed-audio decode/encode via the system FFmpeg
// libraries (libavformat/libavcodec/libavutil/libswresample).
//
// The reference tool decodes MP3/OGG/M4A through librosa -> audioread ->
// ffmpeg (neural_audio_tokenizer.py:4722-4762); this shim is the same
// known-good codec path bound directly, without the Python wrapper stack.
// First-party native decoders (WAV/AIFF/AU/FLAC in nat_tpu/io) stay primary
// for their formats; this shim covers the perceptual codecs and doubles as
// the third-party encoder for golden-vector tests (FLAC/MP3/Vorbis
// fixtures are generated here and decoded by the first-party parsers).
//
// API is C, loaded via ctypes (nat_tpu/io/codecs.py).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace {

struct MemReader {
    const uint8_t *data;
    int64_t size;
    int64_t pos;
};

int mem_read(void *opaque, uint8_t *buf, int buf_size) {
    MemReader *r = static_cast<MemReader *>(opaque);
    int64_t remain = r->size - r->pos;
    if (remain <= 0) return AVERROR_EOF;
    int n = static_cast<int>(remain < buf_size ? remain : buf_size);
    memcpy(buf, r->data + r->pos, n);
    r->pos += n;
    return n;
}

int64_t mem_seek(void *opaque, int64_t offset, int whence) {
    MemReader *r = static_cast<MemReader *>(opaque);
    if (whence == AVSEEK_SIZE) return r->size;
    whence &= ~AVSEEK_FORCE;
    int64_t target = offset;
    if (whence == SEEK_CUR) target = r->pos + offset;
    else if (whence == SEEK_END) target = r->size + offset;
    if (target < 0 || target > r->size) return AVERROR(EINVAL);
    r->pos = target;
    return target;
}

// stdout purity is part of the product contract (stderr too in default
// mode); FFmpeg's default logger writes to stderr, so silence it once.
struct LogSilencer {
    LogSilencer() {
        if (!getenv("NAT_TPU_CODEC_VERBOSE"))
            av_log_set_level(AV_LOG_QUIET);
    }
} log_silencer;

void set_err(char *err, int errlen, const char *msg, int averr = 0) {
    if (!err || errlen <= 0) return;
    if (averr) {
        char buf[128];
        av_strerror(averr, buf, sizeof buf);
        snprintf(err, errlen, "%s: %s", msg, buf);
    } else {
        snprintf(err, errlen, "%s", msg);
    }
}

}  // namespace

extern "C" {

void nat_codecs_free(void *p) { free(p); }

// Decode an in-memory audio container/stream to mono float32.
// Multichannel input is downmixed by swresample (stereo -> (L+R)/2, the
// same mean mixdown as the first-party decoders).  Returns 0 on success;
// caller frees *out with nat_codecs_free.
int nat_decode_audio(const uint8_t *data, int64_t size,
                     float **out, int64_t *out_n, int *out_sr,
                     char *err, int errlen) {
    *out = nullptr;
    *out_n = 0;
    *out_sr = 0;

    MemReader reader{data, size, 0};
    int rc = 0;
    unsigned char *avio_buf =
        static_cast<unsigned char *>(av_malloc(1 << 16));
    AVIOContext *avio = avio_alloc_context(
        avio_buf, 1 << 16, 0, &reader, mem_read, nullptr, mem_seek);
    AVFormatContext *fmt = avformat_alloc_context();
    fmt->pb = avio;
    fmt->flags |= AVFMT_FLAG_CUSTOM_IO;

    AVCodecContext *ctx = nullptr;
    SwrContext *swr = nullptr;
    AVPacket *pkt = nullptr;
    AVFrame *frame = nullptr;
    std::vector<float> pcm;
    int stream_idx = -1;

    if ((rc = avformat_open_input(&fmt, nullptr, nullptr, nullptr)) < 0) {
        set_err(err, errlen, "container open failed", rc);
        goto fail;
    }
    if ((rc = avformat_find_stream_info(fmt, nullptr)) < 0) {
        set_err(err, errlen, "stream probe failed", rc);
        goto fail;
    }
    {
        const AVCodec *codec = nullptr;
        stream_idx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                         &codec, 0);
        if (stream_idx < 0 || !codec) {
            set_err(err, errlen, "no decodable audio stream");
            rc = stream_idx < 0 ? stream_idx : AVERROR_DECODER_NOT_FOUND;
            goto fail;
        }
        ctx = avcodec_alloc_context3(codec);
        avcodec_parameters_to_context(ctx, fmt->streams[stream_idx]->codecpar);
        if ((rc = avcodec_open2(ctx, codec, nullptr)) < 0) {
            set_err(err, errlen, "decoder open failed", rc);
            goto fail;
        }
    }

    pkt = av_packet_alloc();
    frame = av_frame_alloc();

    for (;;) {
        rc = av_read_frame(fmt, pkt);
        bool flushing = (rc == AVERROR_EOF);
        if (rc < 0 && !flushing) {
            set_err(err, errlen, "demux error", rc);
            goto fail;
        }
        if (!flushing && pkt->stream_index != stream_idx) {
            av_packet_unref(pkt);
            continue;
        }
        rc = avcodec_send_packet(ctx, flushing ? nullptr : pkt);
        if (!flushing) av_packet_unref(pkt);
        if (rc < 0 && rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) {
            set_err(err, errlen, "decode error", rc);
            goto fail;
        }
        for (;;) {
            rc = avcodec_receive_frame(ctx, frame);
            if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
            if (rc < 0) {
                set_err(err, errlen, "decode error", rc);
                goto fail;
            }
            if (!swr) {
                *out_sr = frame->sample_rate;
                AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
                AVChannelLayout in_layout;
                if (frame->ch_layout.nb_channels > 0) {
                    av_channel_layout_copy(&in_layout, &frame->ch_layout);
                } else {
                    av_channel_layout_default(&in_layout, 1);
                }
                rc = swr_alloc_set_opts2(
                    &swr, &mono, AV_SAMPLE_FMT_FLT, frame->sample_rate,
                    &in_layout, static_cast<AVSampleFormat>(frame->format),
                    frame->sample_rate, 0, nullptr);
                // Plain mean mixdown (matrix 1/nch per channel) so this
                // path matches the first-party decoders exactly;
                // swresample's default stereo downmix is 1/sqrt(2) per
                // channel, not the mean.
                if (rc >= 0 && in_layout.nb_channels > 1) {
                    std::vector<double> matrix(in_layout.nb_channels,
                                               1.0 / in_layout.nb_channels);
                    rc = swr_set_matrix(swr, matrix.data(),
                                        in_layout.nb_channels);
                }
                av_channel_layout_uninit(&in_layout);
                if (rc < 0 || (rc = swr_init(swr)) < 0) {
                    set_err(err, errlen, "resampler init failed", rc);
                    goto fail;
                }
            }
            size_t base = pcm.size();
            pcm.resize(base + frame->nb_samples);
            uint8_t *dst = reinterpret_cast<uint8_t *>(pcm.data() + base);
            int got = swr_convert(swr, &dst, frame->nb_samples,
                                  const_cast<const uint8_t **>(
                                      frame->extended_data),
                                  frame->nb_samples);
            if (got < 0) {
                set_err(err, errlen, "sample conversion failed", got);
                rc = got;
                goto fail;
            }
            pcm.resize(base + got);
            av_frame_unref(frame);
        }
        if (flushing) break;
    }

    // Drain the resampler (it can buffer during downmix).
    if (swr) {
        for (;;) {
            float tail[4096];
            uint8_t *dst = reinterpret_cast<uint8_t *>(tail);
            int got = swr_convert(swr, &dst, 4096, nullptr, 0);
            if (got <= 0) break;
            pcm.insert(pcm.end(), tail, tail + got);
        }
    }

    if (pcm.empty()) {
        set_err(err, errlen, "stream decoded to zero samples");
        rc = AVERROR_INVALIDDATA;
        goto fail;
    }

    *out = static_cast<float *>(malloc(pcm.size() * sizeof(float)));
    memcpy(*out, pcm.data(), pcm.size() * sizeof(float));
    *out_n = static_cast<int64_t>(pcm.size());
    rc = 0;

fail:
    if (swr) swr_free(&swr);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) avformat_close_input(&fmt);
    if (avio) {
        av_freep(&avio->buffer);
        avio_context_free(&avio);
    }
    return rc < 0 ? rc : 0;
}

// Encode float32 samples (interleaved when channels > 1; n = frames)
// to `path` with the named codec/muxer
// (e.g. codec "flac" format "flac", codec "libmp3lame" format "mp3",
// codec "libvorbis" format "ogg", codec "aac" format "ipod").
// Fixture/golden-vector generation for the first-party decoders' tests.
int nat_encode_audio(const float *samples, int64_t n, int sr,
                     int channels,
                     const char *codec_name, const char *format_name,
                     const char *path, char *err, int errlen) {
    int rc = 0;
    AVFormatContext *fmt = nullptr;
    AVCodecContext *ctx = nullptr;
    SwrContext *swr = nullptr;
    AVFrame *frame = nullptr;
    AVPacket *pkt = nullptr;
    AVStream *stream = nullptr;
    const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
    int64_t pos = 0, pts = 0;
    int frame_size = 0;

    if (!codec) {
        set_err(err, errlen, "encoder not available");
        return AVERROR_ENCODER_NOT_FOUND;
    }
    if ((rc = avformat_alloc_output_context2(&fmt, nullptr, format_name,
                                             path)) < 0) {
        set_err(err, errlen, "muxer alloc failed", rc);
        return rc;
    }

    if (channels < 1) channels = 1;
    ctx = avcodec_alloc_context3(codec);
    ctx->sample_rate = sr;
    av_channel_layout_default(&ctx->ch_layout, channels);
    ctx->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0]
                                         : AV_SAMPLE_FMT_FLTP;
    if (strcmp(codec_name, "libvorbis") == 0) {
        // Fixed bitrates are invalid for many rate/channel combinations;
        // VBR quality mode always is.
        ctx->flags |= AV_CODEC_FLAG_QSCALE;
        ctx->global_quality = 5 * FF_QP2LAMBDA;
    } else {
        ctx->bit_rate = 128000;
    }
    ctx->time_base = AVRational{1, sr};
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
        ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if ((rc = avcodec_open2(ctx, codec, nullptr)) < 0) {
        set_err(err, errlen, "encoder open failed", rc);
        goto fail;
    }

    stream = avformat_new_stream(fmt, nullptr);
    avcodec_parameters_from_context(stream->codecpar, ctx);
    stream->time_base = ctx->time_base;

    if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
        if ((rc = avio_open(&fmt->pb, path, AVIO_FLAG_WRITE)) < 0) {
            set_err(err, errlen, "output open failed", rc);
            goto fail;
        }
    }
    if ((rc = avformat_write_header(fmt, nullptr)) < 0) {
        set_err(err, errlen, "header write failed", rc);
        goto fail;
    }

    {
        AVChannelLayout layout;
        av_channel_layout_default(&layout, channels);
        rc = swr_alloc_set_opts2(&swr, &layout, ctx->sample_fmt, sr,
                                 &layout, AV_SAMPLE_FMT_FLT, sr, 0, nullptr);
        av_channel_layout_uninit(&layout);
        if (rc < 0 || (rc = swr_init(swr)) < 0) {
            set_err(err, errlen, "converter init failed", rc);
            goto fail;
        }
    }

    pkt = av_packet_alloc();
    frame_size = ctx->frame_size > 0 ? ctx->frame_size : 4096;

    while (pos <= n) {  // == n: one final flush iteration with 0 samples
        int chunk = static_cast<int>(
            (n - pos) < frame_size ? (n - pos) : frame_size);
        AVFrame *to_send = nullptr;
        if (chunk > 0) {
            frame = av_frame_alloc();
            frame->nb_samples = chunk;
            frame->format = ctx->sample_fmt;
            av_channel_layout_default(&frame->ch_layout, channels);
            frame->sample_rate = sr;
            if ((rc = av_frame_get_buffer(frame, 0)) < 0) {
                set_err(err, errlen, "frame alloc failed", rc);
                goto fail;
            }
            const uint8_t *src = reinterpret_cast<const uint8_t *>(
                samples + pos * channels);
            if ((rc = swr_convert(swr, frame->extended_data, chunk,
                                  &src, chunk)) < 0) {
                set_err(err, errlen, "sample conversion failed", rc);
                goto fail;
            }
            frame->pts = pts;
            pts += chunk;
            to_send = frame;
        }
        rc = avcodec_send_frame(ctx, to_send);
        if (frame) av_frame_free(&frame);
        if (rc < 0 && rc != AVERROR(EAGAIN)) {
            set_err(err, errlen, "encode error", rc);
            goto fail;
        }
        for (;;) {
            rc = avcodec_receive_packet(ctx, pkt);
            if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
            if (rc < 0) {
                set_err(err, errlen, "encode error", rc);
                goto fail;
            }
            av_packet_rescale_ts(pkt, ctx->time_base, stream->time_base);
            pkt->stream_index = stream->index;
            if ((rc = av_interleaved_write_frame(fmt, pkt)) < 0) {
                set_err(err, errlen, "packet write failed", rc);
                goto fail;
            }
        }
        if (chunk == 0) break;
        pos += chunk;
    }

    if ((rc = av_write_trailer(fmt)) < 0) {
        set_err(err, errlen, "trailer write failed", rc);
        goto fail;
    }
    rc = 0;

fail:
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
    if (swr) swr_free(&swr);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) {
        if (fmt->pb && !(fmt->oformat->flags & AVFMT_NOFILE))
            avio_closep(&fmt->pb);
        avformat_free_context(fmt);
    }
    return rc < 0 ? rc : 0;
}

}  // extern "C"
