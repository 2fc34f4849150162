/* MSCR oracle: ccv_mser on COLOR input (dispatches _ccv_mscr).
 * Build: gcc gen_mscr.c -I/root/reference/lib -L/tmp/refbuild/lib -lccv
 *   /usr/lib/x86_64-linux-gnu/libsqlite3.so.0 /usr/lib/x86_64-linux-gnu/libblas.so.3
 *   -lpng -ljpeg -lm -lpthread -o /tmp/gen_mscr && (cd tests/data/gen && /tmp/gen_mscr)
 */
#include <ccv.h>
#include <math.h>
#include <stdio.h>

int main(void)
{
    ccv_dense_matrix_t* image = 0;
    ccv_read("/root/reference/samples/scene.png", &image,
             CCV_IO_RGB_COLOR | CCV_IO_ANY_FILE);
    ccv_mser_param_t params = {
        .min_area = 60, .max_area = (int)(image->rows * image->cols * 0.3 + 0.5),
        .min_diversity = 0.2, .area_threshold = 1.01, .min_margin = 0.003,
        .max_evolution = 200, .edge_blur_sigma = sqrt(3.0),
        .delta = 5, .max_variance = 0.25, .direction = CCV_DARK_TO_BRIGHT,
    };
    ccv_dense_matrix_t* b = 0;
    ccv_array_t* seq = ccv_mser(image, 0, &b, 0, params);
    FILE* f = fopen("scene.mscr.txt", "w");
    fprintf(f, "%d\n", seq->rnum);
    for (int i = 0; i < seq->rnum; i++) {
        ccv_mser_keypoint_t* kp = (ccv_mser_keypoint_t*)ccv_array_get(seq, i);
        fprintf(f, "%d %d %d %d %d %d %d\n", kp->size, kp->keypoint.x,
                kp->keypoint.y, kp->rect.x, kp->rect.y, kp->rect.width,
                kp->rect.height);
    }
    fclose(f);
    printf("mscr: %d regions\n", seq->rnum);
    return 0;
}
