// Declaration-only FFTW stub: DSP/fast_fourier_transform.h must parse for
// time_deinterleaver.h, but the oracle never constructs an FFT, so no
// fftwf_* symbol is ever emitted or linked.
#pragma once
#include <cstddef>

typedef float fftwf_complex[2];
typedef struct fftwf_plan_s *fftwf_plan;

extern "C" {
fftwf_plan fftwf_plan_dft_1d(int, fftwf_complex *, fftwf_complex *, int,
                             unsigned);
void fftwf_execute(const fftwf_plan);
void fftwf_destroy_plan(fftwf_plan);
void *fftwf_malloc(size_t);
void fftwf_free(void *);
}

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_MEASURE (0U)
#define FFTW_ESTIMATE (1U << 6)
