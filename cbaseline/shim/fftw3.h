/* Minimal FFTW3 shim: the 1D r2c/c2r pair PINC's spectral solver uses
 * (src/spectral.c), implemented as a naive O(N^2) DFT with FFTW's
 * unnormalized conventions — correct, slow, fine for the 1D parity
 * decks; the timing baseline uses the multigrid solver anyway. */
#ifndef PINC_SHIM_FFTW3_H
#define PINC_SHIM_FFTW3_H

#include <stddef.h>

/* mirror FFTW: with <complex.h> in scope fftw_complex is the C99
 * complex type (the reference's spectral.c relies on this) */
#if defined(_Complex_I) && defined(complex) && defined(I)
typedef double _Complex fftw_complex;
#else
typedef double fftw_complex[2];
#endif
typedef struct fftw_plan_s *fftw_plan;

#define FFTW_ESTIMATE (1U << 6)
#define FFTW_PRESERVE_INPUT (1U << 4)

void *fftw_malloc(size_t n);
void fftw_free(void *p);
fftw_plan fftw_plan_dft_r2c_1d(int n, double *in, fftw_complex *out,
                               unsigned flags);
fftw_plan fftw_plan_dft_c2r_1d(int n, fftw_complex *in, double *out,
                               unsigned flags);
void fftw_execute(const fftw_plan p);
void fftw_destroy_plan(fftw_plan p);
void fftw_cleanup(void);

#endif
