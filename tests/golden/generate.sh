#!/bin/sh
# Regenerate golden_logn11.json by compiling the UNMODIFIED reference
# sources against the system runtime libgcrypt.so.20 (headers supplied by
# the declaration-only gcrypt.h in this directory).  -DSUPERCOP pins the
# deterministic surf RNG (ref: src/Makefile:41).
set -e
cd "$(dirname "$0")"
REF=/root/reference/src
gcc -O2 -std=c11 -DSUPERCOP -I. -I"$REF" \
    gen_golden.c \
    "$REF"/types.c "$REF"/rng.c "$REF"/fips202.c "$REF"/symmetric-shake.c \
    "$REF"/reduce.c "$REF"/ntt.c "$REF"/rns.c "$REF"/precomp.c \
    "$REF"/poly.c "$REF"/canemb.c "$REF"/sample.c \
    "$REF"/he-mem.c "$REF"/he-encode.c "$REF"/he-encrypt.c "$REF"/he-kem.c \
    "$REF"/he-add.c "$REF"/he-mult.c "$REF"/he-rescale.c "$REF"/he-automorphism.c \
    "$REF"/he-info.c \
    -l:libgcrypt.so.20 -lm -o gen_golden
./gen_golden golden_logn11.json
