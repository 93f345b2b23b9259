// vista_host: native host-side input pipeline ops (C ABI, loaded via ctypes).
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the *host*
// bottleneck the reference delegated to 16 PyTorch DataLoader workers per
// GPU (vwm/data/dataset.py): JPEG decode + center-crop + Lanczos3 resize +
// [-1,1] normalization at 576x1024x25 frames/sample (~110 MB decoded). A
// single Python process feeding a TPU host needs these off the GIL; each
// call below is pure C++ (no Python objects), so Python threads overlap
// fully, and process_jpeg_batch runs its own std::thread pool.
//
// Exposed C ABI:
//   vh_decode_jpeg_info(buf, len, &w, &h)            -> 0/err
//   vh_decode_jpeg(buf, len, out_rgb, w, h)          -> 0/err (8-bit RGB)
//   vh_crop_resize_normalize(src, sw, sh, dst, dw, dh)  (float32 [-1,1] HWC)
//   vh_process_jpeg_batch(bufs, lens, n, dst, dw, dh, threads) -> 0/err
//
// Build: make -C native  (produces libvista_host.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

// --- Lanczos3 separable resampling -----------------------------------------

constexpr int kLanczosA = 3;

inline double lanczos3(double x) {
    if (x == 0.0) return 1.0;
    if (x <= -kLanczosA || x >= kLanczosA) return 0.0;
    double px = M_PI * x;
    return kLanczosA * std::sin(px) * std::sin(px / kLanczosA) / (px * px);
}

// Precomputed filter taps for one output axis (PIL-compatible "support
// scaled by shrink factor" convention so downsampling antialiases).
struct Taps {
    int ksize;
    std::vector<int> bounds;      // per output index: first source index
    std::vector<double> weights;  // ksize weights per output index
};

Taps build_taps(int in_size, int out_size, int src_offset, int src_span) {
    Taps t;
    double scale = static_cast<double>(src_span) / out_size;
    double filterscale = std::max(scale, 1.0);
    double support = kLanczosA * filterscale;
    t.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    t.bounds.resize(out_size);
    t.weights.resize(static_cast<size_t>(out_size) * t.ksize);
    for (int xx = 0; xx < out_size; ++xx) {
        double center = src_offset + (xx + 0.5) * scale;
        int xmin = std::max(0, static_cast<int>(center - support + 0.5));
        int xmax = std::min(in_size, static_cast<int>(center + support + 0.5));
        double* w = &t.weights[static_cast<size_t>(xx) * t.ksize];
        double total = 0.0;
        int k = 0;
        for (int x = xmin; x < xmax; ++x, ++k) {
            w[k] = lanczos3((x - center + 0.5) / filterscale);
            total += w[k];
        }
        for (int i = 0; i < k; ++i) w[i] /= (total != 0.0 ? total : 1.0);
        for (; k < t.ksize; ++k) w[k] = 0.0;
        t.bounds[xx] = xmin;
    }
    return t;
}

// src: 8-bit HWC RGB (sh x sw); dst: float32 HWC (dh x dw) in [-1, 1].
// Center-crops to the destination aspect ratio first (crop folded into taps).
void crop_resize_normalize(const uint8_t* src, int sw, int sh,
                           float* dst, int dw, int dh) {
    double target_aspect = static_cast<double>(dw) / dh;
    double aspect = static_cast<double>(sw) / sh;
    int cx = 0, cy = 0, cw = sw, ch = sh;
    if (aspect > target_aspect) {
        cw = static_cast<int>(std::lround(sh * target_aspect));
        cx = (sw - cw) / 2;
    } else if (aspect < target_aspect) {
        ch = static_cast<int>(std::lround(sw / target_aspect));
        cy = (sh - ch) / 2;
    }

    Taps tx = build_taps(sw, dw, cx, cw);
    Taps ty = build_taps(sh, dh, cy, ch);

    // pass 1: horizontal (full source height, cropped+resized width)
    std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
    for (int y = 0; y < sh; ++y) {
        const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
        float* out = &tmp[static_cast<size_t>(y) * dw * 3];
        for (int x = 0; x < dw; ++x) {
            const double* w = &tx.weights[static_cast<size_t>(x) * tx.ksize];
            int x0 = tx.bounds[x];
            double acc[3] = {0, 0, 0};
            for (int k = 0; k < tx.ksize; ++k) {
                int sx = x0 + k;
                if (sx >= sw) break;
                const uint8_t* p = row + static_cast<size_t>(sx) * 3;
                acc[0] += w[k] * p[0];
                acc[1] += w[k] * p[1];
                acc[2] += w[k] * p[2];
            }
            out[x * 3 + 0] = static_cast<float>(acc[0]);
            out[x * 3 + 1] = static_cast<float>(acc[1]);
            out[x * 3 + 2] = static_cast<float>(acc[2]);
        }
    }
    // pass 2: vertical + normalize to [-1, 1]
    constexpr float kScale = 2.0f / 255.0f;
    for (int y = 0; y < dh; ++y) {
        const double* w = &ty.weights[static_cast<size_t>(y) * ty.ksize];
        int y0 = ty.bounds[y];
        float* out = dst + static_cast<size_t>(y) * dw * 3;
        for (int x = 0; x < dw; ++x) {
            double acc[3] = {0, 0, 0};
            for (int k = 0; k < ty.ksize; ++k) {
                int sy = y0 + k;
                if (sy >= sh) break;
                const float* p = &tmp[(static_cast<size_t>(sy) * dw + x) * 3];
                acc[0] += w[k] * p[0];
                acc[1] += w[k] * p[1];
                acc[2] += w[k] * p[2];
            }
            for (int c = 0; c < 3; ++c) {
                double v = std::clamp(acc[c], 0.0, 255.0);
                out[x * 3 + c] = static_cast<float>(v) * kScale - 1.0f;
            }
        }
    }
}

int decode_jpeg_impl(const uint8_t* buf, size_t len, uint8_t* out, int w, int h) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    if (static_cast<int>(cinfo.output_width) != w ||
        static_cast<int>(cinfo.output_height) != h) {
        jpeg_destroy_decompress(&cinfo);
        return 3;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

}  // namespace

extern "C" {

int vh_decode_jpeg_info(const uint8_t* buf, size_t len, int* w, int* h) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
    jpeg_read_header(&cinfo, TRUE);
    *w = cinfo.image_width;
    *h = cinfo.image_height;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

int vh_decode_jpeg(const uint8_t* buf, size_t len, uint8_t* out, int w, int h) {
    return decode_jpeg_impl(buf, len, out, w, h);
}

void vh_crop_resize_normalize(const uint8_t* src, int sw, int sh,
                              float* dst, int dw, int dh) {
    crop_resize_normalize(src, sw, sh, dst, dw, dh);
}

// Encode one (h, w, 3) RGB frame to JPEG. Writes at most out_cap bytes into
// out; returns the encoded size, or -1 on failure / insufficient capacity.
// Used by the MJPEG/AVI video writer (no ffmpeg in the deploy image).
long vh_encode_jpeg(const uint8_t* rgb, int w, int h, int quality,
                    uint8_t* out, size_t out_cap) {
    jpeg_compress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    unsigned char* mem = nullptr;
    unsigned long mem_size = 0;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_compress(&cinfo);
        if (mem) free(mem);
        return -1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &mem, &mem_size);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = const_cast<uint8_t*>(rgb) +
                       static_cast<size_t>(cinfo.next_scanline) * w * 3;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    long size = static_cast<long>(mem_size);
    if (static_cast<size_t>(size) > out_cap) {
        free(mem);
        return -1;
    }
    std::memcpy(out, mem, mem_size);
    free(mem);
    return size;
}

// Decode n JPEG buffers and write (n, dh, dw, 3) float32 frames, threaded.
int vh_process_jpeg_batch(const uint8_t** bufs, const size_t* lens, int n,
                          float* dst, int dw, int dh, int threads) {
    std::atomic<int> next(0), err(0);
    int nthreads = std::max(1, std::min(threads, n));
    auto work = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n || err.load()) return;
            int w = 0, h = 0;
            if (vh_decode_jpeg_info(bufs[i], lens[i], &w, &h)) { err = 1 + i; return; }
            std::vector<uint8_t> rgb(static_cast<size_t>(w) * h * 3);
            if (decode_jpeg_impl(bufs[i], lens[i], rgb.data(), w, h)) { err = 1 + i; return; }
            crop_resize_normalize(rgb.data(), w, h,
                                  dst + static_cast<size_t>(i) * dw * dh * 3, dw, dh);
        }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(work);
    for (auto& t : pool) t.join();
    return err.load();
}

}  // extern "C"
