/* MSER oracle: ccv_mser (set-union path) on a gray sample.
 * Build: gcc gen_mser.c -I/root/reference/lib -L/tmp/refbuild/lib -lccv \
 *   /usr/lib/x86_64-linux-gnu/libblas.so.3 -lpng -ljpeg -lm -lpthread \
 *   -o /tmp/gen_mser && (cd tests/data/gen && /tmp/gen_mser)
 */
#include <ccv.h>
#include <stdio.h>

int main(void)
{
    ccv_dense_matrix_t* image = 0;
    ccv_read("/root/reference/samples/scene.png", &image, CCV_IO_GRAY | CCV_IO_ANY_FILE);
    ccv_dense_matrix_t* b = 0;
    ccv_mser_param_t params = {
        .delta = 5, .min_area = 60, .max_area = 1 << 28,
        .max_variance = 0.25, .min_diversity = 0.2,
        .direction = CCV_DARK_TO_BRIGHT, .range = 255,
    };
    ccv_array_t* seq = ccv_mser(image, 0, &b, 0, params);
    FILE* f = fopen("scene.mser.txt", "w");
    fprintf(f, "%d\n", seq->rnum);
    for (int i = 0; i < seq->rnum; i++) {
        ccv_mser_keypoint_t* kp = (ccv_mser_keypoint_t*)ccv_array_get(seq, i);
        fprintf(f, "%d %d %d %d %d %d %d\n", kp->size, kp->keypoint.x,
                kp->keypoint.y, kp->rect.x, kp->rect.y, kp->rect.width,
                kp->rect.height);
    }
    fclose(f);
    /* label-map histogram as a compact fingerprint */
    f = fopen("scene.mser_labels.txt", "w");
    int maxl = seq->rnum;
    for (int l = 0; l <= maxl; l++) {
        int cnt = 0;
        for (int i = 0; i < b->rows * b->cols; i++)
            if (b->data.i32[i] == l) cnt++;
        fprintf(f, "%d %d\n", l, cnt);
    }
    fclose(f);
    /* bright-to-dark variant too */
    params.direction = CCV_BRIGHT_TO_DARK;
    ccv_dense_matrix_t* b2 = 0;
    ccv_array_t* seq2 = ccv_mser(image, 0, &b2, 0, params);
    f = fopen("scene.mser_b2d.txt", "w");
    fprintf(f, "%d\n", seq2->rnum);
    for (int i = 0; i < seq2->rnum; i++) {
        ccv_mser_keypoint_t* kp = (ccv_mser_keypoint_t*)ccv_array_get(seq2, i);
        fprintf(f, "%d %d %d %d %d %d %d\n", kp->size, kp->keypoint.x,
                kp->keypoint.y, kp->rect.x, kp->rect.y, kp->rect.width,
                kp->rect.height);
    }
    fclose(f);
    printf("mser: %d d2b, %d b2d\n", seq->rnum, seq2->rnum);
    return 0;
}
