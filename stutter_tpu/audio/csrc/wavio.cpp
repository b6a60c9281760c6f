// Host-side audio runtime: WAV decode + windowed-sinc resample, C ABI.
//
// Capability parity target: the reference's audio loading is
// torchaudio.load + transforms.Resample (C++ libsox/sinc kernels underneath;
// reference WavLM_embeddings.py:87-125). This is the TPU build's native
// equivalent: a dependency-free RIFF/WAVE parser (PCM u8/s16/s24/s32 and IEEE
// float32/64, any channel count -> mono float32) plus the same polyphase
// windowed-sinc resampler the device path uses (sinc_interp_hann,
// lowpass_filter_width=6, rolloff=0.99), and a pthread decode pool so host
// decode can keep ahead of the TPU feed (SURVEY.md §7 "host-decode
// throughput"). Exposed through ctypes (no pybind11 in this environment).
//
// Build: stutter_tpu/audio/build.py compiles this with g++ -O3 on first use;
// stutter_tpu/audio/wavio.py falls back to a pure-numpy implementation when
// no compiler is available.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>
#include <atomic>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

// Returns 0 on success. Caller frees *out with wavio_free.
// On success: *out = mono float32 samples, *n_samples, *sample_rate set.
static int wavio_decode_impl(const char* path, float** out, int64_t* n_samples,
                             int32_t* sample_rate);

// Optional fallback for non-RIFF inputs (FLAC/MP3/OGG/...): build.py registers
// libffdecode's ffdecode_decode here when libav is available, which makes
// every entry point (incl. the threaded batch decoder below) format-agnostic.
// Must be thread-safe and allocate the output with plain malloc.
typedef int (*wavio_fallback_fn)(const char*, float**, int64_t*, int32_t*);
static std::atomic<wavio_fallback_fn> g_fallback{nullptr};

void wavio_set_fallback_decoder(wavio_fallback_fn fn) { g_fallback.store(fn); }

int wavio_decode(const char* path, float** out, int64_t* n_samples, int32_t* sample_rate) {
    // exceptions (bad_alloc on corrupt sizes, etc.) must not cross the C ABI
    int rc;
    try {
        rc = wavio_decode_impl(path, out, n_samples, sample_rate);
    } catch (...) {
        *out = nullptr;
        *n_samples = 0;
        rc = 9;
    }
    // rc==1 is open-failure (missing file) — the fallback cannot help there
    wavio_fallback_fn fb = g_fallback.load();
    if (rc > 1 && fb != nullptr) {
        try {
            rc = fb(path, out, n_samples, sample_rate);
            if (rc != 0) rc += 20;  // distinguish fallback-stage failures
        } catch (...) {
            rc = 29;
        }
    }
    return rc;
}

static int wavio_decode_impl(const char* path, float** out, int64_t* n_samples,
                             int32_t* sample_rate) {
    *out = nullptr;
    *n_samples = 0;
    *sample_rate = 0;
    FILE* f = fopen(path, "rb");
    if (!f) return 1;

    char riff[4], wave[4];
    uint32_t riff_size;
    if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0 ||
        fread(&riff_size, 4, 1, f) != 1 ||
        fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) {
        fclose(f);
        return 2;
    }

    // bound all chunk allocations by the actual file size (streaming-recorder
    // WAVs in the wild carry 0xFFFFFFFF sizes in unpatched headers; a corrupt
    // size must not bad_alloc across the C ABI — per-file skip is the contract)
    if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return 2; }
    long file_size_l = ftell(f);
    if (file_size_l < 12) { fclose(f); return 2; }
    uint64_t file_size = (uint64_t)file_size_l;
    fseek(f, 12, SEEK_SET);

    uint16_t fmt_tag = 0, channels = 0, bits = 0;
    uint32_t rate = 0;
    bool got_fmt = false;
    std::vector<uint8_t> data;

    while (true) {
        char id[4];
        uint32_t size;
        if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
        long pos = ftell(f);
        uint64_t remain = (pos < 0 || (uint64_t)pos > file_size) ? 0 : file_size - (uint64_t)pos;
        uint64_t safe_size = size < remain ? size : remain;
        if (memcmp(id, "fmt ", 4) == 0) {
            if (safe_size < 16) { fclose(f); return 3; }  // legacy/truncated fmt
            std::vector<uint8_t> fmt((size_t)safe_size);
            if (fread(fmt.data(), 1, (size_t)safe_size, f) != (size_t)safe_size) {
                fclose(f);
                return 3;
            }
            if (safe_size & 1) fseek(f, 1, SEEK_CUR);  // RIFF pad byte
            fmt_tag = *(uint16_t*)&fmt[0];
            channels = *(uint16_t*)&fmt[2];
            rate = *(uint32_t*)&fmt[4];
            bits = *(uint16_t*)&fmt[14];
            if (fmt_tag == 0xFFFE && safe_size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
                fmt_tag = *(uint16_t*)&fmt[24];           // SubFormat first 2 bytes
            }
            got_fmt = true;
        } else if (memcmp(id, "data", 4) == 0) {
            data.resize((size_t)safe_size);
            size_t got = fread(data.data(), 1, (size_t)safe_size, f);
            data.resize(got);
            break;
        } else {
            if (fseek(f, (long)(safe_size + (safe_size & 1)), SEEK_CUR) != 0) break;
        }
    }
    fclose(f);
    if (!got_fmt || channels == 0 || rate == 0 || data.empty()) return 4;

    const int bytes_per = bits / 8;
    if (bytes_per == 0) return 5;
    const int64_t frames = (int64_t)data.size() / (bytes_per * channels);
    if (frames <= 0) return 5;

    float* mono = (float*)malloc(sizeof(float) * frames);
    if (!mono) return 6;
    const double inv_ch = 1.0 / channels;
    const uint8_t* p = data.data();

    for (int64_t i = 0; i < frames; i++) {
        double acc = 0.0;
        for (int c = 0; c < channels; c++) {
            const uint8_t* s = p + (i * channels + c) * bytes_per;
            double v = 0.0;
            if (fmt_tag == 1) {  // integer PCM
                switch (bits) {
                    case 8:  v = ((double)*s - 128.0) / 128.0; break;
                    case 16: v = (double)*(int16_t*)s / 32768.0; break;
                    case 24: {
                        int32_t x = (int32_t)(s[0] | (s[1] << 8) | (s[2] << 16));
                        if (x & 0x800000) x |= (int32_t)0xFF000000;
                        v = (double)x / 8388608.0;
                        break;
                    }
                    case 32: v = (double)*(int32_t*)s / 2147483648.0; break;
                    default: free(mono); return 7;
                }
            } else if (fmt_tag == 3) {  // IEEE float
                if (bits == 32) v = (double)*(float*)s;
                else if (bits == 64) v = *(double*)s;
                else { free(mono); return 7; }
            } else {
                free(mono);
                return 7;
            }
            acc += v;
        }
        mono[i] = (float)(acc * inv_ch);
    }

    *out = mono;
    *n_samples = frames;
    *sample_rate = (int32_t)rate;
    return 0;
}

void wavio_free(float* p) { free(p); }

// ---------------------------------------------------------------------------
// Windowed-sinc polyphase resample (same kernel as ops/resample.py)
// ---------------------------------------------------------------------------

static int64_t gcd64(int64_t a, int64_t b) { while (b) { int64_t t = a % b; a = b; b = t; } return a; }

// Output length = ceil(new_freq * n_in / orig_freq). Caller frees with wavio_free.
int wavio_resample(const float* in, int64_t n_in, int32_t orig_freq, int32_t new_freq,
                   int32_t lowpass_filter_width, double rolloff,
                   float** out, int64_t* n_out) {
    *out = nullptr;
    *n_out = 0;
    if (orig_freq <= 0 || new_freq <= 0 || n_in <= 0) return 1;
    if (orig_freq == new_freq) {
        float* y = (float*)malloc(sizeof(float) * n_in);
        if (!y) return 6;
        memcpy(y, in, sizeof(float) * n_in);
        *out = y;
        *n_out = n_in;
        return 0;
    }
    const int64_t g = gcd64(orig_freq, new_freq);
    const int64_t orig = orig_freq / g, knew = new_freq / g;
    const double base_freq = (double)(orig < knew ? orig : knew) * rolloff;
    const int64_t width = (int64_t)ceil((double)lowpass_filter_width * orig / base_freq);
    const int64_t K = 2 * width + orig;

    // kernel[phase][tap]
    std::vector<double> kernel((size_t)(knew * K));
    for (int64_t ph = 0; ph < knew; ph++) {
        for (int64_t j = 0; j < K; j++) {
            double idx = (double)(j - width) / orig;
            double t = (-(double)ph / knew + idx) * base_freq;
            if (t < -lowpass_filter_width) t = -lowpass_filter_width;
            if (t > lowpass_filter_width) t = lowpass_filter_width;
            double w = cos(t * M_PI / lowpass_filter_width / 2.0);
            w *= w;
            double tp = t * M_PI;
            double sinc = (tp == 0.0) ? 1.0 : sin(tp) / tp;
            kernel[(size_t)(ph * K + j)] = sinc * w * (base_freq / orig);
        }
    }

    const int64_t target = (int64_t)ceil((double)knew * n_in / orig);
    float* y = (float*)malloc(sizeof(float) * target);
    if (!y) return 6;

    // x conceptually padded with `width` zeros left and `width + orig` right;
    // output sample m = frame m/knew, phase m%knew.
    const int64_t frames = (n_in + width + orig) / orig + 1;  // generous bound
    for (int64_t m = 0; m < target; m++) {
        const int64_t frame = m / knew, ph = m % knew;
        const int64_t x0 = frame * orig - width;  // tap j reads x[x0 + j]
        const double* kr = &kernel[(size_t)(ph * K)];
        double acc = 0.0;
        int64_t j_lo = x0 < 0 ? -x0 : 0;
        int64_t j_hi = (x0 + K > n_in) ? (n_in - x0) : K;
        for (int64_t j = j_lo; j < j_hi; j++) acc += kr[j] * in[x0 + j];
        y[m] = (float)acc;
    }
    (void)frames;

    *out = y;
    *n_out = target;
    return 0;
}

// ---------------------------------------------------------------------------
// Threaded batch decode(+resample) into caller-provided fixed-size buffers
// ---------------------------------------------------------------------------

// Decodes paths[i] (i < n_files) with `n_threads` worker threads, resamples to
// target_sr, trims to max_samples, writes into out[i*max_samples ...] (zero
// padded) and lengths[i]; status[i] = 0 on success. This is the host feed for
// the bucketed TPU batcher: decode + resample overlap with device compute.
void wavio_decode_batch(const char** paths, int64_t n_files, int32_t target_sr,
                        int64_t max_samples, int32_t n_threads,
                        float* out, int64_t* lengths, int32_t* status) {
    if (n_threads < 1) n_threads = 1;
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        while (true) {
            int64_t i = next.fetch_add(1);
            if (i >= n_files) return;
            float* mono = nullptr;
            int64_t n = 0;
            int32_t sr = 0;
            int rc;
            try {
                rc = wavio_decode(paths[i], &mono, &n, &sr);
            } catch (...) {  // never let a worker exception std::terminate
                rc = 9;
                mono = nullptr;
            }
            if (rc != 0) {
                status[i] = rc;
                lengths[i] = 0;
                memset(out + i * max_samples, 0, sizeof(float) * max_samples);
                continue;
            }
            float* res = mono;
            int64_t n_res = n;
            if (sr != target_sr) {
                float* r = nullptr;
                int64_t nr = 0;
                rc = wavio_resample(mono, n, sr, target_sr, 6, 0.99, &r, &nr);
                free(mono);
                if (rc != 0) {
                    status[i] = 10 + rc;
                    lengths[i] = 0;
                    memset(out + i * max_samples, 0, sizeof(float) * max_samples);
                    continue;
                }
                res = r;
                n_res = nr;
            }
            int64_t keep = n_res < max_samples ? n_res : max_samples;
            memcpy(out + i * max_samples, res, sizeof(float) * keep);
            if (keep < max_samples)
                memset(out + i * max_samples + keep, 0, sizeof(float) * (max_samples - keep));
            lengths[i] = keep;
            status[i] = 0;
            free(res);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
}

}  // extern "C"
