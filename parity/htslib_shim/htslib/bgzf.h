/* shim: everything lives in sam.h (see sam.h header comment) */
#ifndef POMFRET_SHIM_BGZF_H
#define POMFRET_SHIM_BGZF_H
#include "htslib/sam.h"
#endif
