/* Fast default-tier oracles: small-pyramid (low interval) variants so CPU
 * CI compiles a handful of level programs instead of dozens.
 * Build: gcc gen_fast.c -I/root/reference/lib -L/tmp/refbuild/lib -lccv \
 *   /usr/lib/x86_64-linux-gnu/libsqlite3.so.0 /usr/lib/x86_64-linux-gnu/libblas.so.3 \
 *   -lpng -ljpeg -lm -lpthread -o /tmp/gen_fast && (cd tests/data/gen && /tmp/gen_fast)
 */
#include <ccv.h>
#include <stdio.h>

int main(void)
{
    /* 1. SCD: crop180 + open-threshold cascade, interval=1 */
    {
        ccv_dense_matrix_t* a = 0;
        ccv_read("../crop180.png", &a, CCV_IO_RGB_COLOR | CCV_IO_ANY_FILE);
        ccv_scd_classifier_cascade_t* casc =
            ccv_scd_classifier_cascade_read("../face_low.sqlite3");
        ccv_scd_param_t p = { .interval = 1, .min_neighbors = 0,
                              .step_through = 4, .size = ccv_size(48, 48) };
        ccv_array_t* rects = ccv_scd_detect_objects(a, &casc, 1, p);
        FILE* f = fopen("crop180.scd_i1.txt", "w");
        for (int i = 0; i < rects->rnum; i++) {
            ccv_comp_t* c = (ccv_comp_t*)ccv_array_get(rects, i);
            fprintf(f, "%d %d %d %d %.5f\n", c->rect.x, c->rect.y,
                    c->rect.width, c->rect.height, c->classification.confidence);
        }
        fclose(f);
        printf("scd i1: %d\n", rects->rnum);
    }
    /* 2. BBF: crop120 + open thresholds, interval=1 */
    {
        ccv_dense_matrix_t* a = 0;
        ccv_read("../crop120.png", &a, CCV_IO_GRAY | CCV_IO_ANY_FILE);
        ccv_bbf_classifier_cascade_t* casc =
            ccv_bbf_read_classifier_cascade("/root/reference/samples/face");
        for (int i = 0; i < casc->count; i++)
            casc->stage_classifier[i].threshold = -1e9f;
        ccv_bbf_param_t p = { .interval = 1, .min_neighbors = 0, .accurate = 1,
                              .flags = 0, .size = ccv_size(24, 24) };
        ccv_array_t* rects = ccv_bbf_detect_objects(a, &casc, 1, p);
        FILE* f = fopen("crop120.bbf_i1.txt", "w");
        for (int i = 0; i < rects->rnum; i++) {
            ccv_comp_t* c = (ccv_comp_t*)ccv_array_get(rects, i);
            fprintf(f, "%d %d %d %d %.5f\n", c->rect.x, c->rect.y,
                    c->rect.width, c->rect.height, c->classification.confidence);
        }
        fclose(f);
        printf("bbf i1: %d\n", rects->rnum);
    }
    /* 3. ICF: pedestrian + open thresholds, interval=1 */
    {
        ccv_dense_matrix_t* a = 0;
        ccv_read("/root/reference/samples/pedestrian.png", &a,
                 CCV_IO_RGB_COLOR | CCV_IO_ANY_FILE);
        ccv_icf_classifier_cascade_t* casc =
            ccv_icf_read_classifier_cascade("/root/reference/samples/pedestrian.icf");
        for (int i = 0; i < casc->count; i++)
            casc->weak_classifiers[i].threshold = -1e9f;
        ccv_icf_param_t p = { .interval = 1, .min_neighbors = 0,
                              .threshold = 0, .step_through = 2, .flags = 0 };
        ccv_icf_multiscale_classifier_cascade_t* mc = 0;
        ccv_array_t* rects = ccv_icf_detect_objects(a, &casc, 1, p);
        (void)mc;
        FILE* f = fopen("pedestrian.icf_i1.txt", "w");
        for (int i = 0; i < rects->rnum; i++) {
            ccv_comp_t* c = (ccv_comp_t*)ccv_array_get(rects, i);
            fprintf(f, "%d %d %d %d %.5f\n", c->rect.x, c->rect.y,
                    c->rect.width, c->rect.height, c->classification.confidence);
        }
        fclose(f);
        printf("icf i1: %d\n", rects->rnum);
    }
    /* 4. DPM: street + pedestrian.m, interval=2, raw */
    {
        ccv_dense_matrix_t* a = 0;
        ccv_read("/root/reference/samples/street.png", &a, CCV_IO_ANY_FILE);
        ccv_dpm_mixture_model_t* model =
            ccv_dpm_read_mixture_model("/root/reference/samples/pedestrian.m");
        ccv_dpm_param_t p = { .interval = 0, .min_neighbors = 0,
                              .flags = 0, .threshold = 0.4 };
        ccv_array_t* rects = ccv_dpm_detect_objects(a, &model, 1, p);
        FILE* f = fopen("street.dpm_i0.txt", "w");
        if (rects)
            for (int i = 0; i < rects->rnum; i++) {
                ccv_root_comp_t* c = (ccv_root_comp_t*)ccv_array_get(rects, i);
                fprintf(f, "%d %d %d %d %.4f\n", c->rect.x, c->rect.y,
                        c->rect.width, c->rect.height, c->classification.confidence);
            }
        fclose(f);
        printf("dpm i2: %d\n", rects ? rects->rnum : 0);
    }
    /* 5. SIFT: book crop 160x160, up2x off, noctaves 2 */
    {
        ccv_dense_matrix_t* img = 0;
        ccv_read("/root/reference/samples/book.png", &img, CCV_IO_GRAY | CCV_IO_ANY_FILE);
        ccv_dense_matrix_t* crop = 0;
        ccv_slice(img, (ccv_matrix_t**)&crop, CCV_8U | CCV_C1, 60, 60, 160, 160);
        ccv_sift_param_t p = { .noctaves = 2, .nlevels = 6, .up2x = 0,
                               .edge_threshold = 10, .norm_threshold = 0,
                               .peak_threshold = 0 };
        ccv_array_t* kps = 0;
        ccv_sift(crop, &kps, 0, 0, p);
        FILE* f = fopen("book_crop.sift.txt", "w");
        for (int i = 0; i < kps->rnum; i++) {
            ccv_keypoint_t* kp = (ccv_keypoint_t*)ccv_array_get(kps, i);
            fprintf(f, "%.3f %.3f %d %d %.4f %.4f\n", kp->x, kp->y,
                    kp->octave, kp->level, kp->regular.scale, kp->regular.angle);
        }
        fclose(f);
        printf("sift crop: %d\n", kps->rnum);
    }
    return 0;
}
