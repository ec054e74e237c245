/* Stub libespeak-ng implementing the exact ABI surface that
 * pl_bert_tpu/preprocess/phonemize.py::EspeakBackend binds with ctypes
 * (espeak-ng speak_lib.h: espeak_Initialize / espeak_SetVoiceByName /
 * espeak_TextToPhonemes). The real library is absent from this image
 * (CLAUDE.md), so this stub exists to execute the binding's FFI call
 * loop — clause-chunked returns with pointer advancement, NULL
 * terminator, static result buffer reuse, UTF-8 in both directions —
 * against a deterministic model the test reimplements in Python.
 *
 * Behavioral spec (mirrored by tests/test_espeak_stub_ffi.py):
 *  - espeak_Initialize returns 22050, or -1 when the env var
 *    ESPEAK_STUB_FAIL_INIT is set (exercises the binding's error path).
 *  - espeak_SetVoiceByName accepts "ar" and "en" (returns 0), rejects
 *    anything else (returns 1). A call counter is exported so the test
 *    can assert the binding re-asserts the voice per segment (espeak's
 *    voice is process-global state).
 *  - espeak_TextToPhonemes consumes ONE clause per call: everything up
 *    to and including the first '.', else the whole remainder. It
 *    advances *textptr past the clause (NULL once the text is
 *    exhausted) and returns a pointer to a static buffer overwritten on
 *    the next call — the real library's contract.
 *  - Phoneme model: each whitespace-separated word becomes U+02C8 (ˈ)
 *    followed by the word with ASCII letters lowercased and a->U+0251
 *    (ɑ), e->U+025B (ɛ); all other bytes (including multi-byte UTF-8
 *    sequences, e.g. Arabic script) pass through verbatim. Words are
 *    joined with single spaces. A lone '.' clause yields "".
 */
#include <stdlib.h>
#include <string.h>

static int g_last_options = -1;
static int g_last_output_mode = -1;
static int g_voice_calls = 0;
static int g_last_textmode = -1;
static int g_last_phonememode = -1;
static char g_voice[32];

int espeak_Initialize(int output, int buflength, const char *path,
                      int options) {
  (void)buflength;
  (void)path;
  g_last_output_mode = output;
  g_last_options = options;
  if (getenv("ESPEAK_STUB_FAIL_INIT") != NULL) return -1;
  return 22050;
}

int espeak_SetVoiceByName(const char *name) {
  g_voice_calls += 1;
  if (name != NULL && (strcmp(name, "ar") == 0 || strcmp(name, "en") == 0)) {
    strncpy(g_voice, name, sizeof(g_voice) - 1);
    return 0;
  }
  return 1;
}

/* introspection exports for the test (not part of the espeak ABI) */
int espeak_stub_last_options(void) { return g_last_options; }
int espeak_stub_last_output_mode(void) { return g_last_output_mode; }
int espeak_stub_voice_calls(void) { return g_voice_calls; }
int espeak_stub_last_textmode(void) { return g_last_textmode; }
int espeak_stub_last_phonememode(void) { return g_last_phonememode; }

static char g_out[8192];

const char *espeak_TextToPhonemes(const void **textptr, int textmode,
                                  int phonememode) {
  g_last_textmode = textmode;
  g_last_phonememode = phonememode;
  const char *text = (const char *)*textptr;
  if (text == NULL) return NULL;

  /* clause = up to and including the first '.' (else whole remainder) */
  const char *dot = strchr(text, '.');
  size_t clause_len = dot != NULL ? (size_t)(dot - text) + 1 : strlen(text);
  const char *rest = text + clause_len;
  *textptr = (*rest == '\0') ? NULL : (const void *)rest;

  size_t o = 0;
  int in_word = 0;
  for (size_t i = 0; i < clause_len && o + 8 < sizeof(g_out); i++) {
    unsigned char c = (unsigned char)text[i];
    if (c == ' ' || c == '\t' || c == '\n' || c == '.') {
      in_word = 0;
      continue;
    }
    if (!in_word) {
      if (o > 0) g_out[o++] = ' ';
      g_out[o++] = (char)0xCB; /* U+02C8 MODIFIER LETTER VERTICAL LINE */
      g_out[o++] = (char)0x88;
      in_word = 1;
    }
    if (c >= 'A' && c <= 'Z') c = (unsigned char)(c - 'A' + 'a');
    if (c == 'a') {
      g_out[o++] = (char)0xC9; /* U+0251 */
      g_out[o++] = (char)0x91;
    } else if (c == 'e') {
      g_out[o++] = (char)0xC9; /* U+025B */
      g_out[o++] = (char)0x9B;
    } else {
      g_out[o++] = (char)c;
    }
  }
  g_out[o] = '\0';
  return g_out;
}
