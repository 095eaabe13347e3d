/* GSL shim implementation: MT19937, polar Box-Muller gaussian, LU. */
#include <gsl/gsl_rng.h>
#include <gsl/gsl_randist.h>
#include <gsl/gsl_linalg.h>

#include <math.h>
#include <stdlib.h>
#include <string.h>

static const gsl_rng_type mt_type = {"mt19937-shim"};
const gsl_rng_type *gsl_rng_mt19937 = &mt_type;

/* ------------------------------------------------------------- MT19937 */
#define MT_N 624
#define MT_M 397
#define MT_MATRIX_A 0x9908b0dfUL
#define MT_UPPER 0x80000000UL
#define MT_LOWER 0x7fffffffUL

static void mt_seed(gsl_rng *r, unsigned long s)
{
    if (s == 0) s = 4357;               /* GSL convention */
    r->mt[0] = s & 0xffffffffUL;
    for (r->mti = 1; r->mti < MT_N; r->mti++) {
        r->mt[r->mti] = (1812433253UL
                         * (r->mt[r->mti - 1] ^ (r->mt[r->mti - 1] >> 30))
                         + (unsigned long)r->mti) & 0xffffffffUL;
    }
}

static unsigned long mt_next(gsl_rng *r)
{
    unsigned long y;
    if (r->mti >= MT_N) {
        int kk;
        for (kk = 0; kk < MT_N - MT_M; kk++) {
            y = (r->mt[kk] & MT_UPPER) | (r->mt[kk + 1] & MT_LOWER);
            r->mt[kk] = r->mt[kk + MT_M] ^ (y >> 1)
                ^ ((y & 1) ? MT_MATRIX_A : 0);
        }
        for (; kk < MT_N - 1; kk++) {
            y = (r->mt[kk] & MT_UPPER) | (r->mt[kk + 1] & MT_LOWER);
            r->mt[kk] = r->mt[kk + (MT_M - MT_N)] ^ (y >> 1)
                ^ ((y & 1) ? MT_MATRIX_A : 0);
        }
        y = (r->mt[MT_N - 1] & MT_UPPER) | (r->mt[0] & MT_LOWER);
        r->mt[MT_N - 1] = r->mt[MT_M - 1] ^ (y >> 1)
            ^ ((y & 1) ? MT_MATRIX_A : 0);
        r->mti = 0;
    }
    y = r->mt[r->mti++];
    y ^= (y >> 11);
    y ^= (y << 7) & 0x9d2c5680UL;
    y ^= (y << 15) & 0xefc60000UL;
    y ^= (y >> 18);
    return y;
}

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T)
{
    (void)T;
    gsl_rng *r = malloc(sizeof(gsl_rng));
    mt_seed(r, 4357);
    return r;
}

void gsl_rng_set(const gsl_rng *r, unsigned long seed)
{
    mt_seed((gsl_rng *)r, seed);
}

void gsl_rng_free(gsl_rng *r) { free(r); }

double gsl_rng_uniform_pos(const gsl_rng *r)
{
    double u;
    do {
        u = mt_next((gsl_rng *)r) / 4294967296.0;
    } while (u <= 0.0);
    return u;
}

double gsl_ran_gaussian_ziggurat(const gsl_rng *r, double sigma)
{
    /* polar Box-Muller with a one-deep cache */
    static int have = 0;
    static double cached = 0.0;
    if (have) {
        have = 0;
        return sigma * cached;
    }
    double u, v, s;
    do {
        u = 2.0 * gsl_rng_uniform_pos(r) - 1.0;
        v = 2.0 * gsl_rng_uniform_pos(r) - 1.0;
        s = u * u + v * v;
    } while (s >= 1.0 || s == 0.0);
    double f = sqrt(-2.0 * log(s) / s);
    cached = v * f;
    have = 1;
    return sigma * u * f;
}

/* ------------------------------------------------------------------- LU */
gsl_matrix_view gsl_matrix_view_array(double *base, size_t n1, size_t n2)
{
    gsl_matrix_view v;
    v.matrix.size1 = n1;
    v.matrix.size2 = n2;
    v.matrix.tda = n2;
    v.matrix.data = base;
    return v;
}

double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j)
{
    return m->data[i * m->tda + j];
}

gsl_permutation *gsl_permutation_alloc(size_t n)
{
    gsl_permutation *p = malloc(sizeof(gsl_permutation));
    p->size = n;
    p->data = malloc(n * sizeof(size_t));
    for (size_t i = 0; i < n; i++) p->data[i] = i;
    return p;
}

void gsl_permutation_free(gsl_permutation *p)
{
    if (p) { free(p->data); free(p); }
}

int gsl_linalg_LU_decomp(gsl_matrix *A, gsl_permutation *p, int *signum)
{
    size_t n = A->size1;
    double *a = A->data;
    size_t tda = A->tda;
    *signum = 1;
    for (size_t i = 0; i < n; i++) p->data[i] = i;

    for (size_t k = 0; k < n; k++) {
        /* partial pivot */
        size_t piv = k;
        double amax = fabs(a[k * tda + k]);
        for (size_t i = k + 1; i < n; i++) {
            double v = fabs(a[i * tda + k]);
            if (v > amax) { amax = v; piv = i; }
        }
        if (piv != k) {
            for (size_t j = 0; j < n; j++) {
                double tmp = a[k * tda + j];
                a[k * tda + j] = a[piv * tda + j];
                a[piv * tda + j] = tmp;
            }
            size_t tp = p->data[k];
            p->data[k] = p->data[piv];
            p->data[piv] = tp;
            *signum = -*signum;
        }
        double pivval = a[k * tda + k];
        if (pivval == 0.0) continue;     /* singular; mirror GSL's tolerance */
        for (size_t i = k + 1; i < n; i++) {
            double m = a[i * tda + k] / pivval;
            a[i * tda + k] = m;
            for (size_t j = k + 1; j < n; j++)
                a[i * tda + j] -= m * a[k * tda + j];
        }
    }
    return 0;
}

int gsl_linalg_LU_invert(const gsl_matrix *LU, const gsl_permutation *p,
                         gsl_matrix *inverse)
{
    size_t n = LU->size1;
    const double *lu = LU->data;
    size_t tda = LU->tda;
    double *inv = inverse->data;
    size_t itda = inverse->tda;
    double *col = malloc(n * sizeof(double));

    for (size_t c = 0; c < n; c++) {
        /* solve LU x = P e_c, column by column */
        for (size_t i = 0; i < n; i++)
            col[i] = (p->data[i] == c) ? 1.0 : 0.0;
        /* forward substitution (L has unit diagonal) */
        for (size_t i = 1; i < n; i++)
            for (size_t j = 0; j < i; j++)
                col[i] -= lu[i * tda + j] * col[j];
        /* back substitution */
        for (size_t ii = n; ii-- > 0;) {
            for (size_t j = ii + 1; j < n; j++)
                col[ii] -= lu[ii * tda + j] * col[j];
            col[ii] /= lu[ii * tda + ii];
        }
        for (size_t i = 0; i < n; i++)
            inv[i * itda + c] = col[i];
    }
    free(col);
    return 0;
}
