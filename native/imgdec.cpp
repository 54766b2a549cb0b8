// Threaded JPEG/PNG decoder — native data-loader hot path.
//
// Python-side image decode (PIL) is the throughput ceiling of the training
// data pipeline once the degradation runs on-device; this decoder uses
// libjpeg/libpng directly with a C ABI (ctypes-bound, no pybind11) and is
// driven by a Python thread pool (decode releases the GIL since it runs
// entirely in C).
//
// Build: g++ -O3 -shared -fPIC imgdec.cpp -ljpeg -lpng -o libimgdec.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// Decode a JPEG file to RGB8. Caller passes a buffer of cap bytes; returns
// 0 on success and writes width/height. Returns -1 on open/decode error,
// -2 if the buffer is too small (width/height still written).
int decode_jpeg_rgb(const char* path, uint8_t* out, int64_t cap,
                    int32_t* width, int32_t* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  // default error handler calls exit(); override with longjmp
  static thread_local jmp_buf jump;
  jerr.error_exit = [](j_common_ptr) { longjmp(jump, 1); };
  if (setjmp(jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -1;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const int64_t need = (int64_t)cinfo.output_width * cinfo.output_height * 3;
  if (need > cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  const int stride = cinfo.output_width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (int64_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// Decode a PNG file to RGB8 (alpha stripped, palettes expanded, 16-bit
// downsampled). Same contract as decode_jpeg_rgb.
int decode_png_rgb(const char* path, uint8_t* out, int64_t cap,
                   int32_t* width, int32_t* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_byte header[8];
  if (fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(f);
    return -1;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -1;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  *width = png_get_image_width(png, info);
  *height = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  const int64_t need = (int64_t)(*width) * (*height) * 3;
  if (need > cap) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -2;
  }
  const int64_t stride = (int64_t)(*width) * 3;
  for (int32_t y = 0; y < *height; ++y) {
    png_bytep row = out + y * stride;
    png_read_row(png, row, nullptr);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

}  // extern "C"
