// Native parallel Green's-kernel sampler.
//
// TPU-native replacement for the reference's shared-memory parallel kernel
// sampler `sampleGkernelpar` (src/FastConvolution.jl:337-401), which fans the
// evaluation of (i/4) h^2 H0^(1)(k r) over Julia worker processes.  Here the
// same embarrassingly parallel sweep is an OpenMP loop over a contiguous
// buffer; the result feeds setup-time tables that are then transferred to the
// TPU once (the hot loop never evaluates special functions).
//
// H0^(1)(x) = J0(x) + i Y0(x), evaluated with libstdc++'s C++17 special math.

#include <cmath>
#include <cstddef>

extern "C" {

// out is interleaved complex128 (re, im) of length 2*n.
// r: distances (length n), scaled by k before evaluation.
// scale_re/scale_im: complex prefactor (typically (i/4) h^2).
void sample_hankel0_kernel(const double* r, std::size_t n, double k,
                           double scale_re, double scale_im, double* out) {
#pragma omp parallel for schedule(static)
  for (std::ptrdiff_t i = 0; i < static_cast<std::ptrdiff_t>(n); ++i) {
    const double x = k * r[i];
    const double j0 = std::cyl_bessel_j(0.0, x);
    const double y0 = std::cyl_neumann(0.0, x);
    // (scale_re + i scale_im) * (j0 + i y0)
    out[2 * i] = scale_re * j0 - scale_im * y0;
    out[2 * i + 1] = scale_re * y0 + scale_im * j0;
  }
}

// 3D kernel: exp(i k r) h^2 / (4 pi r)  (src/FastConvolution3D.jl:188)
void sample_helmholtz3d_kernel(const double* r, std::size_t n, double k,
                               double h2, double* out) {
  const double c = h2 / (4.0 * M_PI);
#pragma omp parallel for schedule(static)
  for (std::ptrdiff_t i = 0; i < static_cast<std::ptrdiff_t>(n); ++i) {
    const double x = k * r[i];
    const double a = c / r[i];
    out[2 * i] = a * std::cos(x);
    out[2 * i + 1] = a * std::sin(x);
  }
}

}  // extern "C"
