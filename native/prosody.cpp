// Prosodic feature extraction — native backend for offline preprocessing.
//
// The reference's feature extractor is Praat via praat-parselmouth (C++,
// SURVEY §2.7); this implements the SAME math as the framework's numpy
// reference (tacotron2_tpu/audio/prosody.py) — autocorrelation F0 with
// parabolic interpolation, dual-criterion voicing, intensity dB re 2e-5,
// local jitter/shimmer, noise-to-harmonics, envelope-peak speaking rate —
// so the two backends are interchangeable (parity-tested) and the process
// pool runs ~an order of magnitude faster per utterance.
//
// C API: prosody_extract(wav, n, sr, frame_ms, hop_ms, out[18]) -> 0 ok,
// nonzero = degenerate audio (caller drops the row, like the reference,
// preprocessing/ljspeech.py:37-38).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kPRef = 2e-5;
constexpr double kF0Min = 75.0;
constexpr double kF0Max = 600.0;
constexpr double kVoicingThreshold = 0.45;

// numpy 'linear' percentile on a COPY of the data
double percentile(std::vector<double> v, double q) {
    if (v.empty()) return 0.0;
    std::sort(v.begin(), v.end());
    double pos = (v.size() - 1) * q / 100.0;
    size_t lo = (size_t)pos;
    double frac = pos - lo;
    if (lo + 1 >= v.size()) return v.back();
    return v[lo] * (1.0 - frac) + v[lo + 1] * frac;
}

double mean(const std::vector<double>& v) {
    if (v.empty()) return 0.0;
    double s = 0.0;
    for (double x : v) s += x;
    return s / v.size();
}

}  // namespace

extern "C" {

// out layout matches tacotron2_tpu.audio.prosody.FEATURE_NAMES:
// [duration, duration_vcd, pitch_mean, pitch_5, pitch_95, pitch_range,
//  pitch_mean_log, pitch_5_log, pitch_95_log, pitch_range_log,
//  intensity_mean, intensity_mean_vcd, jitter, shimmer, nhr, nhr_vcd,
//  rate, rate_vcd]
int prosody_extract(const float* wav, int64_t n, int sr,
                    double frame_ms, double hop_ms, double* out) {
    double duration = (double)n / sr;
    if (duration < 0.05) return 1;
    double peak = 0.0;
    for (int64_t i = 0; i < n; ++i) peak = std::max(peak, std::fabs((double)wav[i]));
    if (peak < 1e-6) return 1;

    int frame = (int)(sr * frame_ms / 1000.0);
    int hop = (int)(sr * hop_ms / 1000.0);
    int64_t n_frames = (n >= frame) ? 1 + (n - frame) / hop : 0;
    if (n_frames < 3) return 1;

    int lag_min = (int)(sr / kF0Max);
    int lag_max = std::min((int)(sr / kF0Min), frame - 2);

    std::vector<double> f0(n_frames), r(n_frames), intensity_db(n_frames);
    std::vector<double> power(n_frames);
    std::vector<double> x(frame);

    for (int64_t fi = 0; fi < n_frames; ++fi) {
        const float* p = wav + fi * hop;
        double m = 0.0, pw = 0.0;
        for (int i = 0; i < frame; ++i) m += p[i];
        m /= frame;
        for (int i = 0; i < frame; ++i) {
            x[i] = p[i] - m;
            pw += (double)p[i] * p[i];
        }
        pw /= frame;
        power[fi] = pw;
        intensity_db[fi] = 10.0 * std::log10(std::max(pw, 1e-20) / (kPRef * kPRef));

        // direct normalized autocorrelation over the candidate lag range
        // (identical values to the numpy FFT autocorrelation)
        double ac0 = 1e-12;
        for (int i = 0; i < frame; ++i) ac0 += x[i] * x[i];
        int span_lo = std::max(1, lag_min - 1);
        int span_hi = std::min(frame - 1, lag_max + 1);
        std::vector<double> acn(span_hi + 1, 0.0);
        for (int lag = span_lo; lag <= span_hi; ++lag) {
            double s = 0.0;
            for (int i = 0; i + lag < frame; ++i) s += x[i] * x[i + lag];
            acn[lag] = s / ac0;
        }
        int best = lag_min;
        for (int lag = lag_min; lag <= lag_max; ++lag)
            if (acn[lag] > acn[best]) best = lag;
        r[fi] = acn[best];
        // parabolic interpolation (clipped delta, like the numpy path)
        int l0 = std::min(std::max(best, lag_min + 1), lag_max - 1);
        double ym1 = acn[l0 - 1], y0 = acn[l0], yp1 = acn[l0 + 1];
        double denom = ym1 - 2.0 * y0 + yp1;
        double delta = (std::fabs(denom) > 1e-12) ? 0.5 * (ym1 - yp1) / denom : 0.0;
        delta = std::min(0.5, std::max(-0.5, delta));
        f0[fi] = sr / (l0 + delta);
    }

    // voicing: periodic AND within 35 dB of peak intensity
    double db_max = *std::max_element(intensity_db.begin(), intensity_db.end());
    double floor_db = db_max - 35.0;
    std::vector<double> f0v, log10v, lnv, amps, idb_v, nhr_v;
    std::vector<double> nhr_all;
    int64_t n_voiced = 0;
    for (int64_t fi = 0; fi < n_frames; ++fi) {
        double rc = std::min(std::max(r[fi], 1e-3), 1.0 - 1e-6);
        double nhr = std::min(std::max((1.0 - rc) / rc, 0.0), 10.0);
        nhr_all.push_back(nhr);
        bool voiced = (r[fi] > kVoicingThreshold) && (intensity_db[fi] > floor_db);
        if (voiced) {
            ++n_voiced;
            f0v.push_back(f0[fi]);
            log10v.push_back(std::log10(f0[fi]));
            lnv.push_back(std::log(f0[fi]));
            amps.push_back(std::sqrt(std::max(power[fi], 1e-20)));
            idb_v.push_back(intensity_db[fi]);
            nhr_v.push_back(nhr);
        }
    }
    if (n_voiced < 3) return 1;
    double duration_vcd = (double)n_voiced * hop / sr;

    double p5 = percentile(log10v, 5), p95 = percentile(log10v, 95);
    double p5l = percentile(lnv, 5), p95l = percentile(lnv, 95);

    // jitter / shimmer over consecutive voiced periods
    std::vector<double> periods(f0v.size());
    for (size_t i = 0; i < f0v.size(); ++i) periods[i] = 1.0 / f0v[i];
    double dp = 0.0, da = 0.0;
    for (size_t i = 1; i < periods.size(); ++i) dp += std::fabs(periods[i] - periods[i - 1]);
    for (size_t i = 1; i < amps.size(); ++i) da += std::fabs(amps[i] - amps[i - 1]);
    double jitter = (dp / (periods.size() - 1)) / std::max(mean(periods), 1e-12);
    double shimmer = (da / (amps.size() - 1)) / std::max(mean(amps), 1e-12);

    // speaking rate: smoothed-envelope peaks above the median
    int k = std::max(1, (int)(50.0 / hop_ms));
    std::vector<double> env(n_frames, 0.0);
    int off = (k - 1) / 2;  // numpy convolve 'same' alignment
    for (int64_t i = 0; i < n_frames; ++i) {
        double s = 0.0;
        for (int j = 0; j < k; ++j) {
            int64_t idx = i + off - j;
            if (idx >= 0 && idx < n_frames) s += intensity_db[idx];
        }
        env[i] = s / k;
    }
    double thresh = percentile(env, 50);
    int peaks = 0;
    for (int64_t i = 1; i + 1 < n_frames; ++i)
        if (env[i] > env[i - 1] && env[i] >= env[i + 1] && env[i] > thresh) ++peaks;

    out[0] = duration;
    out[1] = duration_vcd;
    out[2] = mean(log10v);
    out[3] = p5;
    out[4] = p95;
    out[5] = p95 - p5;
    out[6] = mean(lnv);
    out[7] = p5l;
    out[8] = p95l;
    out[9] = p95l - p5l;
    out[10] = mean(intensity_db);
    out[11] = mean(idb_v);
    out[12] = jitter;
    out[13] = shimmer;
    out[14] = mean(nhr_all);
    out[15] = mean(nhr_v);
    out[16] = peaks / duration;
    out[17] = peaks / std::max(duration_vcd, 1e-6);
    return 0;
}

}  // extern "C"
