// Native runtime components for ccv_tpu (twin of the reference's C runtime
// pieces: lib/ccv_cache.c LRU cache, lib/ccv_memory.c signatures via
// siphash, lib/ccv_io.c libpng/libjpeg decoders).
//
// Exposed as a plain C ABI consumed via ctypes (ccv_tpu/core/native.py).
// Built with: make -C native  (produces libccv_tpu_native.so)

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <list>
#include <mutex>
#include <unordered_map>

extern "C" {

// ---------------------------------------------------------------------------
// siphash-2-4 (public algorithm, Aumasson & Bernstein) for 64-bit content
// signatures — the same primitive the reference vendors for
// ccv_cache_generate_signature.
// ---------------------------------------------------------------------------

static inline uint64_t rotl64(uint64_t x, int b) { return (x << b) | (x >> (64 - b)); }

uint64_t ccv_tpu_siphash24(const uint8_t* data, size_t len, const uint8_t key[16])
{
    uint64_t k0, k1;
    memcpy(&k0, key, 8);
    memcpy(&k1, key + 8, 8);
    uint64_t v0 = 0x736f6d6570736575ULL ^ k0;
    uint64_t v1 = 0x646f72616e646f6dULL ^ k1;
    uint64_t v2 = 0x6c7967656e657261ULL ^ k0;
    uint64_t v3 = 0x7465646279746573ULL ^ k1;
    const uint8_t* end = data + (len & ~7ULL);
    uint64_t b = (uint64_t)len << 56;

#define SIPROUND \
    v0 += v1; v1 = rotl64(v1, 13); v1 ^= v0; v0 = rotl64(v0, 32); \
    v2 += v3; v3 = rotl64(v3, 16); v3 ^= v2; \
    v0 += v3; v3 = rotl64(v3, 21); v3 ^= v0; \
    v2 += v1; v1 = rotl64(v1, 17); v1 ^= v2; v2 = rotl64(v2, 32);

    for (; data != end; data += 8) {
        uint64_t m;
        memcpy(&m, data, 8);
        v3 ^= m;
        SIPROUND; SIPROUND;
        v0 ^= m;
    }
    size_t left = len & 7;
    for (size_t i = 0; i < left; i++)
        b |= (uint64_t)data[i] << (8 * i);
    v3 ^= b;
    SIPROUND; SIPROUND;
    v0 ^= b;
    v2 ^= 0xff;
    SIPROUND; SIPROUND; SIPROUND; SIPROUND;
    return v0 ^ v1 ^ v2 ^ v3;
#undef SIPROUND
}

// ---------------------------------------------------------------------------
// byte-bounded LRU blob cache (ccv_cache_t twin: put/get/delete/drain)
// ---------------------------------------------------------------------------

struct CacheEntry {
    uint64_t sig;
    uint8_t* data;
    size_t size;
};

struct LruCache {
    size_t budget;
    size_t used = 0;
    std::list<CacheEntry> lru;  // front = most recent
    std::unordered_map<uint64_t, std::list<CacheEntry>::iterator> index;
    std::mutex mu;
};

void* ccv_tpu_cache_new(size_t budget)
{
    auto* c = new LruCache();
    c->budget = budget;
    return c;
}

static void cache_evict_locked(LruCache* c)
{
    while (c->used > c->budget && !c->lru.empty()) {
        CacheEntry& victim = c->lru.back();
        c->used -= victim.size;
        c->index.erase(victim.sig);
        free(victim.data);
        c->lru.pop_back();
    }
}

int ccv_tpu_cache_put(void* handle, uint64_t sig, const uint8_t* data, size_t size)
{
    auto* c = (LruCache*)handle;
    std::lock_guard<std::mutex> lock(c->mu);
    if (size > c->budget)
        return -1;
    auto it = c->index.find(sig);
    if (it != c->index.end()) {
        c->lru.splice(c->lru.begin(), c->lru, it->second);
        return 0;
    }
    uint8_t* copy = (uint8_t*)malloc(size);
    if (!copy)
        return -1;
    memcpy(copy, data, size);
    c->lru.push_front(CacheEntry{sig, copy, size});
    c->index[sig] = c->lru.begin();
    c->used += size;
    cache_evict_locked(c);
    return 0;
}

// returns size (0 = miss); caller passes a buffer of at least `cap` bytes
size_t ccv_tpu_cache_get(void* handle, uint64_t sig, uint8_t* out, size_t cap)
{
    auto* c = (LruCache*)handle;
    std::lock_guard<std::mutex> lock(c->mu);
    auto it = c->index.find(sig);
    if (it == c->index.end())
        return 0;
    c->lru.splice(c->lru.begin(), c->lru, it->second);
    CacheEntry& e = *it->second;
    if (out && cap >= e.size)
        memcpy(out, e.data, e.size);
    return e.size;
}

int ccv_tpu_cache_delete(void* handle, uint64_t sig)
{
    auto* c = (LruCache*)handle;
    std::lock_guard<std::mutex> lock(c->mu);
    auto it = c->index.find(sig);
    if (it == c->index.end())
        return -1;
    c->used -= it->second->size;
    free(it->second->data);
    c->lru.erase(it->second);
    c->index.erase(it);
    return 0;
}

void ccv_tpu_cache_drain(void* handle)
{
    auto* c = (LruCache*)handle;
    std::lock_guard<std::mutex> lock(c->mu);
    for (auto& e : c->lru)
        free(e.data);
    c->lru.clear();
    c->index.clear();
    c->used = 0;
}

size_t ccv_tpu_cache_size(void* handle)
{
    auto* c = (LruCache*)handle;
    std::lock_guard<std::mutex> lock(c->mu);
    return c->used;
}

void ccv_tpu_cache_free(void* handle)
{
    ccv_tpu_cache_drain(handle);
    delete (LruCache*)handle;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// libpng / libjpeg decoders (optional: compiled in when headers exist)
// ---------------------------------------------------------------------------

#ifdef HAVE_LIBPNG
#include <png.h>

extern "C" int ccv_tpu_decode_png(const char* path, uint8_t** out,
                                  int* rows, int* cols, int* channels)
{
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return -1;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_set_palette_to_rgb(png);
    png_set_expand_gray_1_2_4_to_8(png);
    png_set_strip_16(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);
    int h = png_get_image_height(png, info);
    int w = png_get_image_width(png, info);
    int ch = png_get_channels(png, info);
    size_t rowbytes = png_get_rowbytes(png, info);
    uint8_t* buf = (uint8_t*)malloc(rowbytes * h);
    png_bytep* rowps = (png_bytep*)malloc(sizeof(png_bytep) * h);
    for (int i = 0; i < h; i++)
        rowps[i] = buf + i * rowbytes;
    png_read_image(png, rowps);
    free(rowps);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    *out = buf;
    *rows = h;
    *cols = w;
    *channels = ch;
    return 0;
}
#endif

#ifdef HAVE_LIBJPEG
#include <cstdio>
#include <jpeglib.h>

extern "C" int ccv_tpu_decode_jpeg(const char* path, uint8_t** out,
                                   int* rows, int* cols, int* channels)
{
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_start_decompress(&cinfo);
    int w = cinfo.output_width;
    int h = cinfo.output_height;
    int ch = cinfo.output_components;
    uint8_t* buf = (uint8_t*)malloc((size_t)w * h * ch);
    while ((int)cinfo.output_scanline < h) {
        uint8_t* rowp = buf + (size_t)cinfo.output_scanline * w * ch;
        jpeg_read_scanlines(&cinfo, &rowp, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    *out = buf;
    *rows = h;
    *cols = w;
    *channels = ch;
    return 0;
}
#endif

extern "C" void ccv_tpu_free(void* p) { free(p); }
