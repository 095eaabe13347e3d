/* Minimal GSL linear-algebra shim: dense LU decompose/invert with
 * partial pivoting (Doolittle), covering PINC's capacitance-matrix
 * inversion (src/object.c:268-277). */
#ifndef PINC_SHIM_GSL_LINALG_H
#define PINC_SHIM_GSL_LINALG_H

#include <stddef.h>

typedef struct {
    size_t size1;   /* rows */
    size_t size2;   /* cols */
    size_t tda;     /* row stride */
    double *data;
} gsl_matrix;

typedef struct {
    gsl_matrix matrix;
} gsl_matrix_view;

typedef struct {
    size_t size;
    size_t *data;
} gsl_permutation;

gsl_matrix_view gsl_matrix_view_array(double *base, size_t n1, size_t n2);
double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j);

gsl_permutation *gsl_permutation_alloc(size_t n);
void gsl_permutation_free(gsl_permutation *p);

int gsl_linalg_LU_decomp(gsl_matrix *A, gsl_permutation *p, int *signum);
int gsl_linalg_LU_invert(const gsl_matrix *LU, const gsl_permutation *p,
                         gsl_matrix *inverse);

#endif
