/* SWT scale-invariant oracle on tests/data/text_test.png.
 * Build: gcc gen_swt_si.c -I/root/reference/lib -L/tmp/refbuild/lib -lccv \
 *   /usr/lib/x86_64-linux-gnu/libsqlite3.so.0 /usr/lib/x86_64-linux-gnu/libblas.so.3 \
 *   -lpng -ljpeg -lm -lpthread -o /tmp/gen_swt_si && (cd tests/data/gen && /tmp/gen_swt_si)
 */
#include <ccv.h>
#include <stdio.h>

int main(void)
{
    ccv_dense_matrix_t* image = 0;
    ccv_read("../text_test.png", &image, CCV_IO_GRAY | CCV_IO_ANY_FILE);
    if (!image) { printf("no image\n"); return 1; }
    ccv_swt_param_t params = ccv_swt_default_params;
    params.scale_invariant = 1;
    ccv_array_t* words = ccv_swt_detect_words(image, params);
    FILE* f = fopen("text_test.swt_si.txt", "w");
    fprintf(f, "%d\n", words ? words->rnum : 0);
    if (words)
        for (int i = 0; i < words->rnum; i++) {
            ccv_rect_t* r = (ccv_rect_t*)ccv_array_get(words, i);
            fprintf(f, "%d %d %d %d\n", r->x, r->y, r->width, r->height);
        }
    fclose(f);
    printf("swt si words: %d\n", words ? words->rnum : 0);
    return 0;
}
