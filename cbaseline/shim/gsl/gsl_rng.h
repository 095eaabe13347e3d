/* Minimal GSL RNG shim: MT19937 core with the gsl_rng_* API surface the
 * PINC reference uses (alloc/set/free/uniform_pos).  The generator IS
 * the standard MT19937, seeded GSL-style (seed as-is; GSL maps seed 0
 * to 4357 — PINC always seeds >= 1, src/main.c:107). */
#ifndef PINC_SHIM_GSL_RNG_H
#define PINC_SHIM_GSL_RNG_H

typedef struct {
    const char *name;
} gsl_rng_type;

typedef struct {
    unsigned long mt[624];
    int mti;
} gsl_rng;

extern const gsl_rng_type *gsl_rng_mt19937;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T);
void gsl_rng_set(const gsl_rng *r, unsigned long seed);
void gsl_rng_free(gsl_rng *r);
double gsl_rng_uniform_pos(const gsl_rng *r);

#endif
