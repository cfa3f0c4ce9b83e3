// Build shim for the reference oracle: the reference declares a global
// `inline scalar_t abs(scalar_t)` (gmres.h:21) which modern libstdc++
// rejects (conflicts with the constexpr global abs(double)).  Pre-include
// every system dependency, then rename only the reference's identifier.
#include "bbfmm/blas_wrapper.h"
#include <functional>
#include <chrono>
#include <iomanip>
#define abs ref_abs
#include "/root/reference/gmres.cpp"
