// Fused EDF channel decode + resample.
//
// Reads int16 samples of one channel straight out of the strided EDF record
// matrix (records x samples-per-record layout), applies the
// digital->physical->normalized affine in registers, and linearly
// interpolates onto the model's uniform grid — one pass, no intermediate
// contiguous raw buffer. This replaces three numpy sweeps (strided copy,
// affine, gather/lerp) on hosts where memory traffic is the bottleneck.
//
// phys = (dig - dig_min) * bitvalue + phys_min   (edflib convention)
// norm = phys * scale + offset                    (mV / [-1,1] mapping)
// out[j] = lerp(sig, grid_j * fs) with zero outside [0, n-1].

#include <cmath>
#include <cstdint>

extern "C" {

void w2s_decode_resample(
    const int16_t* records,   // base of the EDF data area (memmap)
    int64_t n_records,        // number of data records
    int64_t record_stride,    // total int16 samples per record (all channels)
    int64_t ch_offset,        // this channel's offset within a record
    int64_t ch_spr,           // this channel's samples per record
    double dig_min, double bitvalue, double phys_min,
    double scale, double offset,   // channel normalization affine
    double fs,                // sampling frequency (Hz)
    const double* grid,       // target timestamps (seconds), length m
    int64_t m,
    float* out)               // output, length m
{
  const int64_t n = n_records * ch_spr;
  if (n <= 0) {
    for (int64_t j = 0; j < m; ++j) out[j] = 0.0f;
    return;
  }
  // Fold digital->physical->normalized into one affine: v = dig * a + b.
  const double a = bitvalue * scale;
  const double b = (phys_min - dig_min * bitvalue) * scale + offset;

  auto sample = [&](int64_t i) -> double {
    const int64_t rec = i / ch_spr;
    const int64_t within = i - rec * ch_spr;
    return static_cast<double>(records[rec * record_stride + ch_offset + within]);
  };

  for (int64_t j = 0; j < m; ++j) {
    const double pos = grid[j] * fs;
    if (pos < 0.0 || pos > static_cast<double>(n - 1)) {
      out[j] = 0.0f;
      continue;
    }
    const int64_t i0 = static_cast<int64_t>(pos);
    const double frac = pos - static_cast<double>(i0);
    const double v0 = sample(i0);
    const double v1 = (i0 + 1 < n) ? sample(i0 + 1) : v0;
    out[j] = static_cast<float>((v0 + frac * (v1 - v0)) * a + b);
  }
}

// Quantized-grid transport: resample one channel onto the model's uniform
// grid entirely in the *digital* (int16) domain. The lerp of two int16
// samples stays within [digital_min, digital_max], so rounding back to int16
// costs at most 0.5 LSB — the EDF's own quantization noise — while shipping
// half the bytes of float32 to the device. The device applies the
// digital->physical affine, masks grid points past the recording
// (j >= n_valid, returned here), z-scores and runs the model; no gather.
//
// pos_j = (j+1) * step * fs   (right-aligned grid, preprocessing.py grid)
int64_t w2s_resample_q16(
    const int16_t* records,   // base of the EDF data area (memmap)
    int64_t n_records,        // number of data records
    int64_t record_stride,    // total int16 samples per record (all channels)
    int64_t ch_offset,        // this channel's offset within a record
    int64_t ch_spr,           // this channel's samples per record
    double fs,                // sampling frequency (Hz)
    double step,              // grid spacing (seconds)
    int64_t m,                // grid length
    int16_t* out)             // output, length m (digital units)
{
  const int64_t n = n_records * ch_spr;
  if (n <= 0) {
    for (int64_t j = 0; j < m; ++j) out[j] = 0;
    return 0;
  }
  auto sample = [&](int64_t i) -> double {
    const int64_t rec = i / ch_spr;
    const int64_t within = i - rec * ch_spr;
    return static_cast<double>(records[rec * record_stride + ch_offset + within]);
  };
  const double ratio = step * fs;
  int64_t n_valid = m;
  for (int64_t j = 0; j < m; ++j) {
    const double pos = (static_cast<double>(j) + 1.0) * ratio;
    if (pos > static_cast<double>(n - 1)) {
      n_valid = j;
      for (int64_t k = j; k < m; ++k) out[k] = 0;
      break;
    }
    const int64_t i0 = static_cast<int64_t>(pos);
    const double frac = pos - static_cast<double>(i0);
    const double v0 = sample(i0);
    const double v1 = (i0 + 1 < n) ? sample(i0 + 1) : v0;
    out[j] = static_cast<int16_t>(std::lrint(v0 + frac * (v1 - v0)));
  }
  return n_valid;
}

}  // extern "C"
