/* Minimal GSL RNG shim implementing the taus (Tausworthe/taus88) generator,
   API-compatible with the subset used by ngsF-HMM. Public algorithm
   (L'Ecuyer 1996); independent implementation for test-fixture generation. */
#pragma once
#include <stdlib.h>

typedef struct { unsigned long s1, s2, s3; } gsl_rng;
typedef int gsl_rng_type;
static const gsl_rng_type gsl_rng_taus = 0;

#define _GSL_SHIM_MASK 0xffffffffUL
#define _GSL_SHIM_TAUS(s,a,b,c,d) ((((s & c) << d) & _GSL_SHIM_MASK) ^ ((((s << a) & _GSL_SHIM_MASK) ^ s) >> b))

static inline unsigned long _gsl_shim_taus_get(gsl_rng *r){
  r->s1 = _GSL_SHIM_TAUS(r->s1, 13, 19, 4294967294UL, 12);
  r->s2 = _GSL_SHIM_TAUS(r->s2, 2, 25, 4294967288UL, 4);
  r->s3 = _GSL_SHIM_TAUS(r->s3, 3, 11, 4294967280UL, 17);
  return (r->s1 ^ r->s2 ^ r->s3);
}

static inline gsl_rng *gsl_rng_alloc(gsl_rng_type t){ (void)t; return (gsl_rng*) calloc(1, sizeof(gsl_rng)); }

static inline void gsl_rng_set(gsl_rng *r, unsigned long s){
  if (s == 0) s = 1;
#define _GSL_SHIM_LCG(n) ((69069UL * (n)) & 0xffffffffUL)
  r->s1 = _GSL_SHIM_LCG(s);      if (r->s1 < 2)  r->s1 += 2UL;
  r->s2 = _GSL_SHIM_LCG(r->s1);  if (r->s2 < 8)  r->s2 += 8UL;
  r->s3 = _GSL_SHIM_LCG(r->s2);  if (r->s3 < 16) r->s3 += 16UL;
  for (int i = 0; i < 6; i++) _gsl_shim_taus_get(r);
}

static inline double gsl_rng_uniform(gsl_rng *r){ return _gsl_shim_taus_get(r) / 4294967296.0; }
static inline void gsl_rng_free(gsl_rng *r){ free(r); }
