/* fastloader: native batch-gather kernels for the host input pipeline.
 *
 * The reference feeds its GPU through torch DataLoader worker processes doing
 * per-sample __getitem__ + collate (get_data.py:569-592). This framework gathers
 * whole batches as contiguous slabs instead; these C kernels do the slab gather +
 * dtype conversion in one pass (no intermediate numpy temporaries) and -- because
 * ctypes releases the GIL during the call -- overlap with JAX dispatch from a plain
 * Python prefetch thread, which matters on few-core TPU-VM hosts.
 *
 * Build: cc -O3 -shared -fPIC -o libfastloader.so fastloader.c
 */
#include <stdint.h>
#include <string.h>

/* Gather rows of a uint8 array: dst[i] = src[idx[i]], rows of row_bytes bytes. */
void gather_u8(const uint8_t *src, const int64_t *idx, int64_t n,
               int64_t row_bytes, uint8_t *dst) {
    for (int64_t i = 0; i < n; ++i) {
        memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, (size_t)row_bytes);
    }
}

/* Gather rows of a float64 array converting to float32 (the MultiBench image .npy
 * stores float64; the device wants f32). */
void gather_f64_to_f32(const double *src, const int64_t *idx, int64_t n,
                       int64_t row_elems, float *dst) {
    for (int64_t i = 0; i < n; ++i) {
        const double *s = src + idx[i] * row_elems;
        float *d = dst + i * row_elems;
        for (int64_t j = 0; j < row_elems; ++j) {
            d[j] = (float)s[j];
        }
    }
}

/* Gather rows of a float32 array (pass-through copy). */
void gather_f32(const float *src, const int64_t *idx, int64_t n,
                int64_t row_elems, float *dst) {
    for (int64_t i = 0; i < n; ++i) {
        memcpy(dst + i * row_elems, src + idx[i] * row_elems,
               (size_t)(row_elems * 4));
    }
}

/* Gather + uint8 -> float32 with scale/shift: d = (s/255 - mean) / std.
 * Fuses the audio normalization into the gather when the caller wants host-side
 * normalization (the default path normalizes on device instead). */
void gather_u8_normalize(const uint8_t *src, const int64_t *idx, int64_t n,
                         int64_t row_elems, float mean, float std, float *dst) {
    const float inv = 1.0f / (255.0f * std);
    const float shift = mean / std;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t *s = src + idx[i] * row_elems;
        float *d = dst + i * row_elems;
        for (int64_t j = 0; j < row_elems; ++j) {
            d[j] = (float)s[j] * inv - shift;
        }
    }
}
