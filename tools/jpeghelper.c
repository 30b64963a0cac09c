/* Test-only golden harness for the arithmetic-JPEG decoder.
 *
 * Compiled on demand by tests/test_jpeg_arith.py (skipped when gcc or
 * libjpeg headers are absent); never part of the runtime engine.
 *
 *   jpeghelper encode <w> <h> <quality> <arith 0|1> <gray 0|1> [prog 0|1] [dri N] [ms 0|1]
 *       ms=1: non-interleaved multi-scan SEQUENTIAL script (one
 *       full-spectral scan per component) — exercises multi-SOS
 *       baseline/SOF9 decoding
 *       raw RGB (or gray) on stdin -> JPEG on stdout
 *   jpeghelper decode
 *       JPEG on stdin -> "w h ncomp\n" + raw bytes on stdout
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_all(FILE *f, size_t *n) {
  size_t cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  size_t got;
  while ((got = fread(buf + len, 1, cap - len, f)) > 0) {
    len += got;
    if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
  }
  *n = len;
  return buf;
}

int main(int argc, char **argv) {
  if (argc >= 2 && strcmp(argv[1], "encode") == 0) {
    int w = atoi(argv[2]), h = atoi(argv[3]), q = atoi(argv[4]);
    int arith = atoi(argv[5]), gray = atoi(argv[6]);
    int prog = argc > 7 ? atoi(argv[7]) : 0;
    int dri = argc > 8 ? atoi(argv[8]) : 0;
    int ms = argc > 9 ? atoi(argv[9]) : 0;
    int ch = gray ? 1 : 3;
    size_t need = (size_t)w * h * ch, n;
    unsigned char *rgb = read_all(stdin, &n);
    if (n < need) { fprintf(stderr, "short input\n"); return 2; }
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    unsigned char *out = NULL;
    unsigned long outlen = 0;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &out, &outlen);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ch;
    cinfo.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, q, TRUE);
    cinfo.arith_code = arith ? TRUE : FALSE;
    cinfo.optimize_coding = FALSE;
    if (prog) jpeg_simple_progression(&cinfo);
    jpeg_scan_info ms_scans[MAX_COMPS_IN_SCAN * 4];
    if (ms) {
      /* sequential (Ss=0..63, Ah=Al=0) but one scan per component:
       * a legal multi-SOS non-interleaved baseline/SOF9 file */
      int nc = cinfo.num_components;
      for (int i = 0; i < nc; i++) {
        ms_scans[i].comps_in_scan = 1;
        ms_scans[i].component_index[0] = i;
        ms_scans[i].Ss = 0; ms_scans[i].Se = 63;
        ms_scans[i].Ah = 0; ms_scans[i].Al = 0;
      }
      cinfo.scan_info = ms_scans;
      cinfo.num_scans = nc;
    }
    if (dri) cinfo.restart_interval = (unsigned int)dri;
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
      JSAMPROW row = rgb + (size_t)cinfo.next_scanline * w * ch;
      jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fwrite(out, 1, outlen, stdout);
    return 0;
  }
  if (argc >= 2 && strcmp(argv[1], "decode") == 0) {
    size_t n;
    unsigned char *data = read_all(stdin, &n);
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, n);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_start_decompress(&cinfo);
    int w = cinfo.output_width, h = cinfo.output_height;
    int ch = cinfo.output_components;
    printf("%d %d %d\n", w, h, ch);
    unsigned char *row = malloc((size_t)w * ch);
    while ((int)cinfo.output_scanline < h) {
      JSAMPROW r = row;
      jpeg_read_scanlines(&cinfo, &r, 1);
      fwrite(row, 1, (size_t)w * ch, stdout);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  fprintf(stderr, "usage: encode|decode ...\n");
  return 1;
}
