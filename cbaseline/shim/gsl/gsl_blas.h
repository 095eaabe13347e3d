/* Empty BLAS shim: PINC includes <gsl/gsl_blas.h> (src/object.c:13) but
 * calls no gsl_blas_* function. */
#ifndef PINC_SHIM_GSL_BLAS_H
#define PINC_SHIM_GSL_BLAS_H
#include <gsl/gsl_linalg.h>
#endif
