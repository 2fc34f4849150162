/* Oracle generator: runs the reference's ccv_hog and
 * ccv_optical_flow_lucas_kanade on sample images and dumps text goldens.
 * Build/run (documented in tests/data/gen/README.md):
 *   gcc gen_hog_lk.c -I/root/reference/lib -L/tmp/refbuild/lib -lccv \
 *       `cat /tmp/refbuild/lib/.deps 2>/dev/null` -lm -o /tmp/gen_hog_lk
 */
#include <ccv.h>
#include <stdio.h>

int main(void)
{
    ccv_dense_matrix_t* image = 0;
    ccv_read("/root/reference/samples/chessbox.png", &image,
             CCV_IO_GRAY | CCV_IO_ANY_FILE);
    /* crop 128x96 top-left for a compact golden */
    ccv_dense_matrix_t* crop = 0;
    ccv_slice(image, (ccv_matrix_t**)&crop, CCV_8U | CCV_C1, 0, 0, 96, 128);
    ccv_dense_matrix_t* h = 0;
    ccv_hog(crop, &h, 0, 9, 8);
    FILE* f = fopen("hog_chessbox_crop.txt", "w");
    fprintf(f, "%d %d %d\n", h->rows, h->cols, CCV_GET_CHANNEL(h->type));
    int n = h->rows * h->cols * CCV_GET_CHANNEL(h->type);
    for (int i = 0; i < n; i++)
        fprintf(f, "%.6f\n", h->data.f32[i]);
    fclose(f);
    printf("hog: %d x %d x %d\n", h->rows, h->cols, CCV_GET_CHANNEL(h->type));

    /* LK: track corners from chessbox to a 2px-shifted copy */
    ccv_dense_matrix_t* b = 0;
    ccv_slice(image, (ccv_matrix_t**)&b, CCV_8U | CCV_C1, 3, 2,
              image->rows - 8, image->cols - 8);
    ccv_dense_matrix_t* a = 0;
    ccv_slice(image, (ccv_matrix_t**)&a, CCV_8U | CCV_C1, 0, 0,
              image->rows - 8, image->cols - 8);
    ccv_array_t* pa = ccv_array_new(sizeof(ccv_decimal_point_t), 64, 0);
    for (int y = 40; y < a->rows - 40; y += 40)
        for (int x = 40; x < a->cols - 40; x += 40) {
            ccv_decimal_point_t pt = ccv_decimal_point(x, y);
            ccv_array_push(pa, &pt);
        }
    ccv_array_t* pb = 0;
    ccv_optical_flow_lucas_kanade(a, b, pa, &pb, ccv_size(15, 15), 3, 0.01);
    f = fopen("lk_chessbox_shift.txt", "w");
    fprintf(f, "%d\n", pa->rnum);
    for (int i = 0; i < pa->rnum; i++) {
        ccv_decimal_point_t* p0 = (ccv_decimal_point_t*)ccv_array_get(pa, i);
        ccv_decimal_point_with_status_t* p1 =
            (ccv_decimal_point_with_status_t*)ccv_array_get(pb, i);
        fprintf(f, "%.3f %.3f %.4f %.4f %d\n", p0->x, p0->y,
                p1->point.x, p1->point.y, (int)p1->status);
    }
    fclose(f);
    printf("lk: %d points\n", pa->rnum);
    return 0;
}
