/* DPM oracles: (1) ccv_filter+ccv_flatten alignment probe, (2) GSEDT probe,
 * (3) raw (min_neighbors=0) DPM detections on pedestrian.png.
 * Build: gcc gen_dpm.c -I/root/reference/lib -L/tmp/refbuild/lib -lccv \
 *        -lpng -ljpeg -lm -lpthread -o /tmp/gen_dpm && /tmp/gen_dpm
 */
#include <ccv.h>
#include <stdio.h>

static void dump_filter(FILE* f, int ar, int ac, int br, int bc, int ch)
{
    ccv_dense_matrix_t* a = ccv_dense_matrix_new(ar, ac, CCV_32F | ch, 0, 0);
    ccv_dense_matrix_t* b = ccv_dense_matrix_new(br, bc, CCV_32F | ch, 0, 0);
    int i;
    for (i = 0; i < ar * ac * ch; i++)
        a->data.f32[i] = sinf(i * 0.37f) + 0.01f * i;
    for (i = 0; i < br * bc * ch; i++)
        b->data.f32[i] = cosf(i * 0.53f);
    ccv_dense_matrix_t* d = 0;
    ccv_filter(a, b, &d, 0, CCV_NO_PADDING);
    ccv_dense_matrix_t* flat = 0;
    ccv_flatten(d, (ccv_matrix_t**)&flat, 0, 0);
    fprintf(f, "%d %d %d %d %d %d %d\n", ar, ac, br, bc, ch, flat->rows, flat->cols);
    for (i = 0; i < flat->rows * flat->cols; i++)
        fprintf(f, "%.5f\n", flat->data.f32[i]);
    ccv_matrix_free(a); ccv_matrix_free(b); ccv_matrix_free(d); ccv_matrix_free(flat);
}

int main(void)
{
    FILE* f = fopen("dpm_filter_probe.txt", "w");
    fprintf(f, "3\n");
    dump_filter(f, 10, 9, 5, 5, 1);
    dump_filter(f, 12, 11, 6, 6, 2);
    dump_filter(f, 20, 16, 15, 5, 3);
    fclose(f);

    /* GSEDT probe with part-like coefficients */
    ccv_dense_matrix_t* g = ccv_dense_matrix_new(9, 11, CCV_32F | CCV_C1, 0, 0);
    for (int i = 0; i < 9 * 11; i++)
        g->data.f32[i] = sinf(i * 0.71f) * 3.0f;
    ccv_dense_matrix_t* out = 0; ccv_dense_matrix_t* mx = 0; ccv_dense_matrix_t* my = 0;
    ccv_distance_transform(g, &out, 0, &mx, 0, &my, 0,
                           0.05, -0.03, 0.11, 0.09, CCV_NEGATIVE | CCV_GSEDT);
    f = fopen("dpm_gsedt_probe.txt", "w");
    fprintf(f, "%d %d\n", out->rows, out->cols);
    for (int i = 0; i < out->rows * out->cols; i++)
        fprintf(f, "%.5f %d %d\n", out->data.f32[i], mx->data.i32[i], my->data.i32[i]);
    fclose(f);

    /* raw DPM detections (min_neighbors=0 -> every window above threshold) */
    ccv_dpm_mixture_model_t* model = ccv_dpm_read_mixture_model("/root/reference/samples/pedestrian.m");
    if (!model) { printf("no model\n"); return 1; }
    ccv_dense_matrix_t* image = 0;
    ccv_read("/root/reference/samples/street.png", &image, CCV_IO_ANY_FILE);
    ccv_dpm_param_t params = ccv_dpm_default_params;
    params.min_neighbors = 0;
    params.threshold = 0.4;
    ccv_array_t* rects = ccv_dpm_detect_objects(image, &model, 1, params);
    f = fopen("street.dpm_open.txt", "w");
    fprintf(f, "%d\n", rects ? rects->rnum : 0);
    if (rects)
        for (int i = 0; i < rects->rnum; i++) {
            ccv_root_comp_t* comp = (ccv_root_comp_t*)ccv_array_get(rects, i);
            fprintf(f, "%d %d %d %d %.4f %d\n", comp->rect.x, comp->rect.y,
                    comp->rect.width, comp->rect.height,
                    comp->classification.confidence, comp->pnum);
        }
    fclose(f);
    printf("dpm raw: %d\n", rects ? rects->rnum : 0);

    /* grouped detections with defaults (the CLI behavior) */
    params = ccv_dpm_default_params;
    rects = ccv_dpm_detect_objects(image, &model, 1, params);
    f = fopen("street.dpm_grouped.txt", "w");
    fprintf(f, "%d\n", rects ? rects->rnum : 0);
    if (rects)
        for (int i = 0; i < rects->rnum; i++) {
            ccv_root_comp_t* comp = (ccv_root_comp_t*)ccv_array_get(rects, i);
            fprintf(f, "%d %d %d %d %.4f\n", comp->rect.x, comp->rect.y,
                    comp->rect.width, comp->rect.height,
                    comp->classification.confidence);
        }
    fclose(f);
    printf("dpm grouped: %d\n", rects ? rects->rnum : 0);
    return 0;
}
