/* Generic audio decode via the system FFmpeg libraries.
 *
 * The reference shells out to the ffmpeg BINARY for any-container decode
 * (reference: backend/app/services/audio.py:7-16). This image has no
 * binary but ships libavformat/libavcodec/libswresample — linking them
 * directly is faster (no fork, no temp WAV) and covers the same container
 * matrix (ogg/flac/m4a/mp3/wav/...). Python binds this via ctypes
 * (audiotabs_tpu/io/avdecode.py) with graceful degradation when the
 * shared library is absent.
 *
 * Build: native/build.sh → libaudiotabs_decode.so
 */

#include <stdlib.h>
#include <string.h>

#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>

/* Decode the first audio stream of `path` to mono float32 at its native
 * sample rate. On success returns 0 and sets *out_buf (malloc'd, caller
 * frees via at_free), *out_n (samples) and *out_sr. Negative on error. */
int at_decode_audio(const char *path, float **out_buf, long long *out_n, int *out_sr) {
    AVFormatContext *fmt = NULL;
    AVCodecContext *cc = NULL;
    SwrContext *swr = NULL;
    AVPacket *pkt = NULL;
    AVFrame *frm = NULL;
    float *buf = NULL;
    long long n = 0;
    size_t cap = 1 << 20;
    int ret = -1;

    *out_buf = NULL;
    *out_n = 0;
    *out_sr = 0;

    if (avformat_open_input(&fmt, path, NULL, NULL) < 0) return -1;
    if (avformat_find_stream_info(fmt, NULL) < 0) { ret = -2; goto done; }

    const AVCodec *dec = NULL;
    int sidx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
    if (sidx < 0 || !dec) { ret = -3; goto done; }

    cc = avcodec_alloc_context3(dec);
    if (!cc) { ret = -4; goto done; }
    if (avcodec_parameters_to_context(cc, fmt->streams[sidx]->codecpar) < 0) { ret = -5; goto done; }
    if (avcodec_open2(cc, dec, NULL) < 0) { ret = -6; goto done; }

    int sr = cc->sample_rate;
    if (sr <= 0) { ret = -7; goto done; }

#if LIBAVUTIL_VERSION_INT >= AV_VERSION_INT(57, 28, 100)
    {
        AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
        AVChannelLayout in = cc->ch_layout;
        if (in.nb_channels == 0) av_channel_layout_default(&in, 1);
        if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, sr,
                                &in, cc->sample_fmt, sr, 0, NULL) < 0) { ret = -8; goto done; }
    }
#else
    {
        int64_t in_layout = cc->channel_layout
            ? (int64_t)cc->channel_layout
            : av_get_default_channel_layout(cc->channels);
        swr = swr_alloc_set_opts(NULL, AV_CH_LAYOUT_MONO, AV_SAMPLE_FMT_FLT, sr,
                                 in_layout, cc->sample_fmt, sr, 0, NULL);
        if (!swr) { ret = -8; goto done; }
    }
#endif
    if (swr_init(swr) < 0) { ret = -9; goto done; }

    pkt = av_packet_alloc();
    frm = av_frame_alloc();
    buf = (float *)malloc(cap * sizeof(float));
    if (!pkt || !frm || !buf) { ret = -10; goto done; }

#define AT_DRAIN_FRAME()                                                      \
    do {                                                                      \
        long long need = n + frm->nb_samples + 256;                           \
        if ((size_t)need > cap) {                                             \
            while ((size_t)need > cap) cap *= 2;                              \
            float *nb = (float *)realloc(buf, cap * sizeof(float));           \
            if (!nb) { ret = -11; goto done; }                                \
            buf = nb;                                                         \
        }                                                                     \
        uint8_t *outp = (uint8_t *)(buf + n);                                 \
        int got = swr_convert(swr, &outp, frm->nb_samples + 256,              \
                              (const uint8_t **)frm->extended_data,           \
                              frm->nb_samples);                               \
        if (got > 0) n += got;                                                \
    } while (0)

    while (av_read_frame(fmt, pkt) >= 0) {
        if (pkt->stream_index == sidx && avcodec_send_packet(cc, pkt) == 0) {
            while (avcodec_receive_frame(cc, frm) == 0) AT_DRAIN_FRAME();
        }
        av_packet_unref(pkt);
    }
    /* flush the decoder */
    avcodec_send_packet(cc, NULL);
    while (avcodec_receive_frame(cc, frm) == 0) AT_DRAIN_FRAME();
    /* flush the resampler */
    for (;;) {
        if ((size_t)(n + 4096) > cap) {
            cap *= 2;
            float *nb = (float *)realloc(buf, cap * sizeof(float));
            if (!nb) { ret = -11; goto done; }
            buf = nb;
        }
        uint8_t *outp = (uint8_t *)(buf + n);
        int got = swr_convert(swr, &outp, 4096, NULL, 0);
        if (got <= 0) break;
        n += got;
    }

    if (n == 0) { ret = -12; goto done; }
    *out_buf = buf;
    buf = NULL; /* ownership to caller */
    *out_n = n;
    *out_sr = sr;
    ret = 0;

done:
    free(buf);
    if (frm) av_frame_free(&frm);
    if (pkt) av_packet_free(&pkt);
    if (swr) swr_free(&swr);
    if (cc) avcodec_free_context(&cc);
    if (fmt) avformat_close_input(&fmt);
    return ret;
}

void at_free(float *buf) { free(buf); }
