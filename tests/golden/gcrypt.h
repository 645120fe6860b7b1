/* Minimal declaration-only stand-in for <gcrypt.h>, used to compile the
 * UNMODIFIED reference sources against the system's runtime
 * libgcrypt.so.20 (the image ships the shared library but not the
 * development headers).  Only the gcry_mpi_* entry points the reference
 * actually calls are declared, with the documented public libgcrypt API
 * signatures (https://gnupg.org/documentation/manuals/gcrypt/), plus the
 * standard mpi_* convenience macros gcrypt.h installs when
 * GCRYPT_NO_MPI_MACROS is unset (the reference uses those shorthands,
 * e.g. ref: src/types.c:120, src/he-kem.c:89).
 */
#ifndef GCRYPT_COMPAT_MIN_H
#define GCRYPT_COMPAT_MIN_H

#include <stddef.h>
/* the real gcrypt.h pulls these in; reference sources rely on that */
#include <stdio.h>
#include <stdarg.h>
#include <string.h>
#include <stdlib.h>

#ifdef __cplusplus
extern "C" {
#endif

struct gcry_mpi;
typedef struct gcry_mpi *gcry_mpi_t;

const char *gcry_check_version(const char *req_version);

void *gcry_malloc(size_t n);
void gcry_free(void *p);

gcry_mpi_t gcry_mpi_new(unsigned int nbits);
void gcry_mpi_release(gcry_mpi_t a);
gcry_mpi_t gcry_mpi_copy(const gcry_mpi_t a);
gcry_mpi_t gcry_mpi_set(gcry_mpi_t w, const gcry_mpi_t u);
gcry_mpi_t gcry_mpi_set_ui(gcry_mpi_t w, unsigned long u);

void gcry_mpi_add(gcry_mpi_t w, gcry_mpi_t u, gcry_mpi_t v);
void gcry_mpi_add_ui(gcry_mpi_t w, gcry_mpi_t u, unsigned long v);
void gcry_mpi_addm(gcry_mpi_t w, gcry_mpi_t u, gcry_mpi_t v, gcry_mpi_t m);
void gcry_mpi_sub(gcry_mpi_t w, gcry_mpi_t u, gcry_mpi_t v);
void gcry_mpi_subm(gcry_mpi_t w, gcry_mpi_t u, gcry_mpi_t v, gcry_mpi_t m);
void gcry_mpi_mul(gcry_mpi_t w, gcry_mpi_t u, gcry_mpi_t v);
void gcry_mpi_mul_ui(gcry_mpi_t w, gcry_mpi_t u, unsigned long v);
void gcry_mpi_mulm(gcry_mpi_t w, gcry_mpi_t u, gcry_mpi_t v, gcry_mpi_t m);
void gcry_mpi_div(gcry_mpi_t q, gcry_mpi_t r,
                  gcry_mpi_t dividend, gcry_mpi_t divisor, int round);
void gcry_mpi_mod(gcry_mpi_t r, gcry_mpi_t dividend, gcry_mpi_t divisor);

int gcry_mpi_cmp(const gcry_mpi_t u, const gcry_mpi_t v);
void gcry_mpi_neg(gcry_mpi_t w, gcry_mpi_t u);
int gcry_mpi_is_neg(gcry_mpi_t a);
unsigned int gcry_mpi_get_nbits(gcry_mpi_t a);
int gcry_mpi_test_bit(gcry_mpi_t a, unsigned int n);
void gcry_mpi_lshift(gcry_mpi_t x, gcry_mpi_t a, unsigned int n);

/* s-expressions (used only by the reference's debug MPI printer,
 * ref: src/types.c:186-205) */
struct gcry_sexp;
typedef struct gcry_sexp *gcry_sexp_t;
typedef unsigned int gcry_error_t;
#define GPG_ERR_NO_ERROR 0
enum {
  GCRYSEXP_FMT_DEFAULT  = 0,
  GCRYSEXP_FMT_CANON    = 1,
  GCRYSEXP_FMT_BASE64   = 2,
  GCRYSEXP_FMT_ADVANCED = 3
};
gcry_error_t gcry_sexp_build(gcry_sexp_t *retsexp, size_t *erroff,
                             const char *format, ...);
size_t gcry_sexp_sprint(gcry_sexp_t sexp, int mode,
                        void *buffer, size_t maxlength);
void gcry_sexp_release(gcry_sexp_t sexp);

/* the standard MPI convenience macros (subset the reference uses) */
#define mpi_new(n)           gcry_mpi_new((n))
#define mpi_release(a)       gcry_mpi_release((a))
#define mpi_copy(a)          gcry_mpi_copy((a))
#define mpi_set(w, u)        gcry_mpi_set((w), (u))
#define mpi_set_ui(w, u)     gcry_mpi_set_ui((w), (u))
#define mpi_add(w, u, v)     gcry_mpi_add((w), (u), (v))
#define mpi_add_ui(w, u, v)  gcry_mpi_add_ui((w), (u), (v))
#define mpi_addm(w, u, v, m) gcry_mpi_addm((w), (u), (v), (m))
#define mpi_sub(w, u, v)     gcry_mpi_sub((w), (u), (v))
#define mpi_subm(w, u, v, m) gcry_mpi_subm((w), (u), (v), (m))
#define mpi_mul(w, u, v)     gcry_mpi_mul((w), (u), (v))
#define mpi_mul_ui(w, u, v)  gcry_mpi_mul_ui((w), (u), (v))
#define mpi_mulm(w, u, v, m) gcry_mpi_mulm((w), (u), (v), (m))
#define mpi_mod(r, a, m)     gcry_mpi_mod((r), (a), (m))
#define mpi_fdiv(q, r, a, m) gcry_mpi_div((q), (r), (a), (m), -1)
#define mpi_cmp(u, v)        gcry_mpi_cmp((u), (v))
#define mpi_neg(w, u)        gcry_mpi_neg((w), (u))
#define mpi_is_neg(a)        gcry_mpi_is_neg((a))
#define mpi_get_nbits(a)     gcry_mpi_get_nbits((a))
#define mpi_test_bit(a, n)   gcry_mpi_test_bit((a), (n))
#define mpi_lshift(x, a, n)  gcry_mpi_lshift((x), (a), (n))

#ifdef __cplusplus
}
#endif

#endif
