// Same abs-rename shim for main.cpp (includes gmres.h).
#include "Aniso.h"
#include "utility/config.h"
#include "matlab_io.h"
#include <functional>
#include <chrono>
#include <iomanip>
#define abs ref_abs
#include "/root/reference/main.cpp"
