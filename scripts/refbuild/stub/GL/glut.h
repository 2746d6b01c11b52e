/* Headless build stub for GLUT (see glew.h stub). */
#ifndef STUB_GLUT_H
#define STUB_GLUT_H

#include <GL/glew.h>
#include <cstdlib>
#include <cstdio>

enum {
  GLUT_RGB = 0, GLUT_DOUBLE = 2,
  GLUT_LEFT_BUTTON = 0, GLUT_RIGHT_BUTTON = 2,
  GLUT_ACTIVE_CTRL = 2,
  GLUT_CURSOR_INHERIT = 100, GLUT_CURSOR_WAIT = 101,
};

static void* const GLUT_BITMAP_HELVETICA_12 = nullptr;
static void* const GLUT_BITMAP_TIMES_ROMAN_24 = nullptr;

static inline void glutInit(int*, char**) {}
static inline void glutInitDisplayMode(unsigned) {}
static inline void glutInitWindowSize(int, int) {}
static inline int glutCreateWindow(const char*) { return 1; }
static inline void glutDisplayFunc(void (*)(void)) {}
static inline void glutIdleFunc(void (*)(void)) {}
static inline void glutKeyboardFunc(void (*)(unsigned char, int, int)) {}
static inline void glutSpecialFunc(void (*)(int, int, int)) {}
static inline void glutMouseFunc(void (*)(int, int, int, int)) {}
static inline void glutMotionFunc(void (*)(int, int)) {}
static inline void glutReshapeFunc(void (*)(int, int)) {}
static inline int glutGetModifiers(void) { return 0; }
static inline void glutPostRedisplay(void) {}
static inline void glutSetCursor(int) {}
static inline void glutSwapBuffers(void) {}
static inline void glutBitmapCharacter(void*, int) {}
static inline int glutBitmapLength(void*, const unsigned char*) { return 0; }
static inline void glutMainLoop(void) {
  fprintf(stderr, "[ERROR] GUI disabled in headless stub build\n");
  exit(1);
}

#endif
