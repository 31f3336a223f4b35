// Shim: FstPrinter lives in fst/fstlib.h in this mini-OpenFst build
// (OpenFst >= 1.4 moved it here; the reference includes both paths).
#ifndef MINIFST_SCRIPT_PRINT_IMPL_H_
#define MINIFST_SCRIPT_PRINT_IMPL_H_
#include "fst/fstlib.h"
#endif
