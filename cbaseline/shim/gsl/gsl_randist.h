/* Gaussian deviates for the GSL shim.  Implemented with the polar
 * Box-Muller method rather than GSL's ziggurat: statistically identical
 * N(0, sigma) stream, different bit-level sequence (documented caveat in
 * cbaseline/README.md — drift-curve comparisons are statistical). */
#ifndef PINC_SHIM_GSL_RANDIST_H
#define PINC_SHIM_GSL_RANDIST_H

#include <gsl/gsl_rng.h>

double gsl_ran_gaussian_ziggurat(const gsl_rng *r, double sigma);

#endif
