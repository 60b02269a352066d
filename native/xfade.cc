// Native host-side generation post-processing.
//
// The device kernel hands back the folded sample matrix; stitching folds
// into one waveform (equal-power crossfade overlap-add,
// fatchord_version.py:342-405) and mu-law expansion (utils/dsp.py:98-103)
// are the remaining host-side hot loops for long utterances — this module
// implements them in C++ (exported with C linkage, loaded via ctypes).
//
// Semantics match ops/fold.py::xfade_and_unfold and dsp/audio.py::
// decode_mu_law exactly (float64, silence warmup = overlap/2, equal-power
// sqrt ramps).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// y: (num_folds, length) float64, modified in place for the fades.
// out: (num_folds * (length - overlap) + ... ) = total_len float64.
void xfade_and_unfold(double* y, int64_t num_folds, int64_t length,
                      int64_t overlap, double* out) {
  const int64_t target = length - 2 * overlap;
  const int64_t total_len = num_folds * (target + overlap) + overlap;
  const int64_t silence_len = overlap / 2;
  const int64_t fade_len = overlap - silence_len;

  std::vector<double> fade_in(overlap), fade_out(overlap);
  for (int64_t i = 0; i < silence_len; ++i) {
    fade_in[i] = 0.0;
    fade_out[i] = 1.0;
  }
  for (int64_t i = 0; i < fade_len; ++i) {
    // t in [-1, 1] inclusive (np.linspace semantics)
    const double t = fade_len > 1 ? -1.0 + 2.0 * i / (fade_len - 1) : -1.0;
    fade_in[silence_len + i] = std::sqrt(0.5 * (1.0 + t));
    fade_out[silence_len + i] = std::sqrt(0.5 * (1.0 - t));
  }

  std::memset(out, 0, sizeof(double) * total_len);
  for (int64_t f = 0; f < num_folds; ++f) {
    double* row = y + f * length;
    for (int64_t i = 0; i < overlap; ++i) row[i] *= fade_in[i];
    for (int64_t i = 0; i < overlap; ++i)
      row[length - overlap + i] *= fade_out[i];
    const int64_t start = f * (target + overlap);
    for (int64_t i = 0; i < length; ++i) out[start + i] += row[i];
  }
}

// In-place mu-law expansion from float samples in [-1, 1]
// (decode_mu_law with from_labels=False): x = sign(y)/mu*((1+mu)^|y| - 1).
void decode_mu_law(double* y, int64_t n, int64_t n_classes) {
  const double mu = static_cast<double>(n_classes - 1);
  for (int64_t i = 0; i < n; ++i) {
    const double v = y[i];
    const double s = (v > 0) - (v < 0);
    y[i] = s / mu * (std::pow(1.0 + mu, std::fabs(v)) - 1.0);
  }
}

// Tail fade-out: linear ramp over the last n_fade samples
// (fatchord_version.py:255-258).
void tail_fade(double* y, int64_t n, int64_t n_fade) {
  if (n_fade > n) n_fade = n;
  for (int64_t i = 0; i < n_fade; ++i) {
    const double g =
        n_fade > 1 ? 1.0 - static_cast<double>(i) / (n_fade - 1) : 0.0;
    y[n - n_fade + i] *= g;
  }
}

}  // extern "C"
