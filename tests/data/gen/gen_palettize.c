/* Palettize wire-format oracle: encode deterministic f32/f16 buffers with
 * the reference's ccv_nnc_palettize at qbits 4/5/8 and dump both the
 * compressed bytes and the reference depalettize output.
 * Build: gcc gen_palettize.c -I/root/reference/lib -I/root/reference/lib/nnc
 *   -L/tmp/refbuild/lib -lccv /usr/lib/x86_64-linux-gnu/libsqlite3.so.0
 *   /usr/lib/x86_64-linux-gnu/libblas.so.3 -lpng -ljpeg -lm -lpthread
 *   -o /tmp/gen_palettize && (cd tests/data/gen && /tmp/gen_palettize)
 */
#include <ccv.h>
#include <nnc/ccv_nnc.h>
#include <stdio.h>

static void one(int datatype, int qbits, int nb, int n, const char* name)
{
    size_t esz = CCV_GET_DATA_TYPE_SIZE(datatype);
    uint8_t* input = (uint8_t*)ccmalloc(esz * n);
    float* f32 = (float*)ccmalloc(sizeof(float) * n);
    for (int i = 0; i < n; i++)
        f32[i] = sinf(i * 0.37f) * 3.0f + ((i * 2654435761u >> 16) & 255) * 0.01f;
    if (datatype == CCV_32F)
        memcpy(input, f32, sizeof(float) * n);
    else
        ccv_float_to_half_precision(f32, (uint16_t*)input, n);
    size_t cap = esz * n * 2 + 4096;
    uint8_t* comp = (uint8_t*)ccmalloc(cap);
    size_t sz = ccv_nnc_palettize(input, datatype, CCV_TENSOR_CPU_MEMORY, n,
                                  qbits, nb, comp, cap);
    uint8_t* out = (uint8_t*)ccmalloc(esz * n);
    ccv_nnc_depalettize(comp, datatype, CCV_TENSOR_CPU_MEMORY, sz, qbits, nb,
                        out, n);
    char fn[256];
    snprintf(fn, sizeof(fn), "palettize_%s.bin", name);
    FILE* f = fopen(fn, "w");
    int hdr[4] = { datatype, qbits, nb, n };
    fwrite(hdr, sizeof(int), 4, f);
    long long ssz = (long long)sz;
    fwrite(&ssz, sizeof(long long), 1, f);
    fwrite(comp, 1, sz, f);
    fwrite(out, 1, esz * n, f);
    fclose(f);
    printf("%s: %d elems -> %zu bytes\n", name, n, sz);
}

int main(void)
{
    one(CCV_32F, 4, 512, 1500, "f32_q4");
    one(CCV_32F, 5, 512, 1500, "f32_q5");
    one(CCV_16F, 8, 1280, 2000, "f16_q8");
    return 0;
}
