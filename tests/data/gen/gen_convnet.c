/* Convnet wire-format + classify oracle: builds a small convnet with
 * deterministic weights, writes the reference SQLite format (f32 and f16),
 * runs ccv_convnet_classify on chessbox.png, dumps top-5.
 * Build: gcc gen_convnet.c -I/root/reference/lib -L/tmp/refbuild/lib -lccv \
 *   /usr/lib/x86_64-linux-gnu/libsqlite3.so.0 -lpng -ljpeg -lm -lpthread \
 *   -o /tmp/gen_convnet && /tmp/gen_convnet  (run in tests/data/gen)
 */
#include <ccv.h>
#include <stdio.h>

int main(void)
{
    ccv_convnet_layer_param_t params[6] = {
        { .type = CCV_CONVNET_CONVOLUTIONAL,
          .input = { .matrix = { .rows = 32, .cols = 32, .channels = 3, .partition = 1 } },
          .output = { .convolutional = { .count = 8, .strides = 1, .border = 2, .rows = 5, .cols = 5, .channels = 3, .partition = 1 } } },
        { .type = CCV_CONVNET_LOCAL_RESPONSE_NORM,
          .input = { .matrix = { .rows = 32, .cols = 32, .channels = 8, .partition = 1 } },
          .output = { .rnorm = { .size = 3, .kappa = 1.0, .alpha = 1e-4, .beta = 0.75 } } },
        { .type = CCV_CONVNET_MAX_POOL,
          .input = { .matrix = { .rows = 32, .cols = 32, .channels = 8, .partition = 1 } },
          .output = { .pool = { .strides = 2, .size = 2, .border = 0 } } },
        { .type = CCV_CONVNET_CONVOLUTIONAL,
          .input = { .matrix = { .rows = 16, .cols = 16, .channels = 8, .partition = 2 } },
          .output = { .convolutional = { .count = 16, .strides = 1, .border = 1, .rows = 3, .cols = 3, .channels = 8, .partition = 2 } } },
        { .type = CCV_CONVNET_AVERAGE_POOL,
          .input = { .matrix = { .rows = 16, .cols = 16, .channels = 16, .partition = 1 } },
          .output = { .pool = { .strides = 2, .size = 2, .border = 0 } } },
        { .type = CCV_CONVNET_FULL_CONNECT,
          .input = { .matrix = { .rows = 8, .cols = 8, .channels = 16, .partition = 1 },
                     .node = { .count = 8 * 8 * 16 } },
          .output = { .full_connect = { .relu = 0, .count = 10 } } },
    };
    ccv_convnet_t* net = ccv_convnet_new(0, ccv_size(32, 32), params, 6);
    int i, j;
    for (i = 0; i < net->count; i++) {
        ccv_convnet_layer_t* l = net->layers + i;
        if (l->type != CCV_CONVNET_CONVOLUTIONAL && l->type != CCV_CONVNET_FULL_CONNECT)
            continue;
        int count = (l->type == CCV_CONVNET_CONVOLUTIONAL) ? l->net.convolutional.count : l->net.full_connect.count;
        for (j = 0; j < l->wnum; j++)
            l->w[j] = sinf((j + i * 131) * 0.53f) * 0.1f;
        for (j = 0; j < count; j++)
            l->bias[j] = cosf((j + i) * 0.71f) * 0.05f;
    }
    net->mean_activity = ccv_dense_matrix_new(32, 32, CCV_32F | CCV_C3, 0, 0);
    for (j = 0; j < 32 * 32 * 3; j++)
        net->mean_activity->data.f32[j] = 100.0f + 20.0f * sinf(j * 0.37f);
    ccv_convnet_write_param_t wp = { .half_precision = 0 };
    ccv_convnet_write(net, "tiny_convnet_f32.sqlite3", wp);
    wp.half_precision = 1;
    ccv_convnet_write(net, "tiny_convnet_f16.sqlite3", wp);

    /* classify chessbox with the f32 net */
    ccv_dense_matrix_t* image = 0;
    ccv_read("/root/reference/samples/street.png", &image, CCV_IO_ANY_FILE | CCV_IO_RGB_COLOR);
    ccv_dense_matrix_t* input = 0;
    ccv_convnet_input_formation(net->input, image, &input);
    ccv_array_t* rank = 0;
    ccv_convnet_classify(net, &input, 1, &rank, 10, 1);
    FILE* f = fopen("tiny_convnet_classify.txt", "w");
    fprintf(f, "%d\n", rank->rnum);
    for (i = 0; i < rank->rnum; i++) {
        ccv_classification_t* c = (ccv_classification_t*)ccv_array_get(rank, i);
        fprintf(f, "%d %.6f\n", c->id, c->confidence);
    }
    fclose(f);
    printf("classified; input %dx%d\n", input->rows, input->cols);
    return 0;
}
