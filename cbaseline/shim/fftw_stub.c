#define _XOPEN_SOURCE 700
#include <complex.h>
#include "fftw3.h"

#include <math.h>
#include <stdlib.h>

struct fftw_plan_s {
    int n;
    int forward;
    double *real;
    fftw_complex *cplx;
};

void *fftw_malloc(size_t n) { return malloc(n); }
void fftw_free(void *p) { free(p); }

fftw_plan fftw_plan_dft_r2c_1d(int n, double *in, fftw_complex *out,
                               unsigned flags)
{
    (void)flags;
    fftw_plan p = malloc(sizeof(*p));
    p->n = n; p->forward = 1; p->real = in; p->cplx = out;
    return p;
}

fftw_plan fftw_plan_dft_c2r_1d(int n, fftw_complex *in, double *out,
                               unsigned flags)
{
    (void)flags;
    fftw_plan p = malloc(sizeof(*p));
    p->n = n; p->forward = 0; p->real = out; p->cplx = in;
    return p;
}

void fftw_execute(const fftw_plan p)
{
    int n = p->n;
    if (p->forward) {
        for (int k = 0; k <= n / 2; k++) {
            double re = 0.0, im = 0.0;
            for (int j = 0; j < n; j++) {
                double a = -2.0 * M_PI * j * k / n;
                re += p->real[j] * cos(a);
                im += p->real[j] * sin(a);
            }
            p->cplx[k] = re + im * I;
        }
    } else {
        /* unnormalized inverse from the Hermitian half-spectrum */
        for (int j = 0; j < n; j++) {
            double acc = creal(p->cplx[0]);
            for (int k = 1; k <= n / 2; k++) {
                double a = 2.0 * M_PI * j * k / n;
                double w = (2 * k == n) ? 1.0 : 2.0;   /* Nyquist once */
                acc += w * (creal(p->cplx[k]) * cos(a)
                            - cimag(p->cplx[k]) * sin(a));
            }
            p->real[j] = acc;
        }
    }
}

void fftw_destroy_plan(fftw_plan p) { free(p); }
void fftw_cleanup(void) {}
