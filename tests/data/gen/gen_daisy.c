/* DAISY oracle: ccv_daisy on a chessbox crop, default params.
 * Build: gcc gen_daisy.c -I/root/reference/lib -L/tmp/refbuild/lib -lccv \
 *   /usr/lib/x86_64-linux-gnu/libsqlite3.so.0 /usr/lib/x86_64-linux-gnu/libblas.so.3 \
 *   -lpng -ljpeg -lm -lpthread -o /tmp/gen_daisy && (cd tests/data/gen && /tmp/gen_daisy)
 */
#include <ccv.h>
#include <stdio.h>

int main(void)
{
    ccv_dense_matrix_t* image = 0;
    ccv_read("/root/reference/samples/chessbox.png", &image, CCV_IO_GRAY | CCV_IO_ANY_FILE);
    ccv_dense_matrix_t* crop = 0;
    ccv_slice(image, (ccv_matrix_t**)&crop, CCV_8U | CCV_C1, 40, 40, 64, 64);
    ccv_daisy_param_t params = {
        .radius = 15, .rad_q_no = 3, .th_q_no = 8, .hist_th_q_no = 8,
        .normalize_threshold = 0.154, .normalize_method = CCV_DAISY_NORMAL_PARTIAL,
    };
    ccv_dense_matrix_t* desc = 0;
    ccv_daisy(crop, &desc, 0, params);
    FILE* f = fopen("daisy_chessbox.txt", "w");
    /* desc: rows x (cols * desc_size) f32 */
    fprintf(f, "%d %d\n", desc->rows, desc->cols);
    for (int i = 0; i < desc->rows * desc->cols; i++)
        fprintf(f, "%.6f\n", desc->data.f32[i]);
    fclose(f);
    printf("daisy: %d x %d\n", desc->rows, desc->cols);
    return 0;
}
