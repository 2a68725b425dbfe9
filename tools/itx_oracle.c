/* Oracle harness: runs the reference 1-D inverse transforms on stdin data and
 * writes results to stdout, for differential testing of our matrix-based
 * implementation.  Protocol (stdin): int32 kind, int32 size, int32 nz,
 * int32 coeffs[size]; repeated. kind: 0=dct2, 1=dst7, 2=dct8.  Output: int32
 * out[size] per request.  EOF-terminated. */
#include <stdio.h>
#include <stdint.h>
#include <string.h>
#include "libavcodec/vvc/vvc_itx_1d.h"

typedef void (*itx_fn)(int *coeffs, ptrdiff_t stride, size_t nz);

static itx_fn get_fn(int kind, int size)
{
    switch (kind) {
    case 0:
        switch (size) {
        case 1: return ff_vvc_inv_dct2_1;
        case 2: return ff_vvc_inv_dct2_2;
        case 4: return ff_vvc_inv_dct2_4;
        case 8: return ff_vvc_inv_dct2_8;
        case 16: return ff_vvc_inv_dct2_16;
        case 32: return ff_vvc_inv_dct2_32;
        case 64: return ff_vvc_inv_dct2_64;
        }
        break;
    case 1:
        switch (size) {
        case 4: return ff_vvc_inv_dst7_4;
        case 8: return ff_vvc_inv_dst7_8;
        case 16: return ff_vvc_inv_dst7_16;
        case 32: return ff_vvc_inv_dst7_32;
        }
        break;
    case 2:
        switch (size) {
        case 4: return ff_vvc_inv_dct8_4;
        case 8: return ff_vvc_inv_dct8_8;
        case 16: return ff_vvc_inv_dct8_16;
        case 32: return ff_vvc_inv_dct8_32;
        }
        break;
    }
    return NULL;
}

int main(void)
{
    int32_t hdr[3];
    int coeffs[64];
    while (fread(hdr, sizeof(int32_t), 3, stdin) == 3) {
        int kind = hdr[0], size = hdr[1], nz = hdr[2];
        if (size < 1 || size > 64)
            return 1;
        if (fread(coeffs, sizeof(int32_t), size, stdin) != (size_t)size)
            return 1;
        itx_fn fn = get_fn(kind, size);
        if (!fn)
            return 2;
        fn(coeffs, 1, nz);
        fwrite(coeffs, sizeof(int32_t), size, stdout);
    }
    return 0;
}
