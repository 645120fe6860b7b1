#!/bin/sh
# Regenerate golden_logn11.json by compiling the UNMODIFIED reference
# sources against the system runtime libgcrypt.so.20 (headers supplied by
# the declaration-only gcrypt.h in this directory).  -DSUPERCOP pins the
# deterministic surf RNG (ref: src/Makefile:41).
set -e
cd "$(dirname "$0")"
REF=/root/reference/src
CORE="$REF/types.c $REF/rng.c $REF/fips202.c $REF/symmetric-shake.c \
    $REF/reduce.c $REF/ntt.c $REF/rns.c $REF/precomp.c \
    $REF/poly.c $REF/canemb.c $REF/sample.c \
    $REF/he-mem.c $REF/he-encode.c $REF/he-encrypt.c $REF/he-kem.c \
    $REF/he-add.c $REF/he-mult.c $REF/he-rescale.c $REF/he-automorphism.c \
    $REF/he-info.c"
gcc -O2 -std=c11 -DSUPERCOP -I. -I"$REF" \
    gen_golden.c $CORE \
    -l:libgcrypt.so.20 -lm -o gen_golden
./gen_golden golden_logn11.json

# algorithm layer at the reference DEFAULT params (VERDICT r3 #3); adds
# he-algo.c + he-bootstrap.c.  Slow: linear+nonlinear are minutes each,
# cmp (logn=15/logq=881, depth (3+iter)(1+t)) tens of minutes.
gcc -O2 -std=c11 -DSUPERCOP -I. -I"$REF" \
    gen_golden_algo.c $CORE "$REF"/he-algo.c "$REF"/he-bootstrap.c \
    -l:libgcrypt.so.20 -lm -o gen_golden_algo
./gen_golden_algo linear golden_algo_linear.json
./gen_golden_algo nonlinear golden_algo_nonlinear.json
./gen_golden_algo cmp golden_algo_cmp.json
